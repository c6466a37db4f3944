"""Deterministic synthetic flights-domain corpus in DynamoDB-JSON wire form.

Generates (it does NOT copy the reference's fixture file) a corpus with
the same *shape* and the same dirty-data realities recorded in SURVEY
§1.3, so the codec/routing/upsert operators are exercised against every
known hazard:

- empty ``{}`` attribute on every item (loader strips it)
- ``number`` typed N on flights but S on assignments
- ``segments`` typed N on bookings but S ("{A, B}") on direct flights
- literal un-substituted ``"${number}"`` in GSI2PK on some assignments
- stringified list ``"[wheelchair, vegan]"`` in SSR
- out-of-range old/future dates among mostly-2021 data

Default sizing mirrors the reference corpus (22 fare / 13 flight /
4 assignment / 1 booking = 40 items); ``scale`` multiplies it for
larger tests.
"""

from __future__ import annotations

import json

from ..functions.ddb import marshal_item

AIRPORTS = ["DEN", "SFO", "JFK", "ATL", "BOS", "ORD", "LAX", "SEA", "MIA"]
PASSENGERS = ["Smith, Jon", "Parker, Jane"]
CLASSES = ["nonstop", "direct"]


def _iso(day: int, hour: int = 0, month: int = 8, year: int = 2021) -> str:
    return f"{year:04d}-{month:02d}-{day:02d}T{hour:02d}:{min(59, day):02d}:00"


def gen_fares(n: int = 22) -> list[dict]:
    items = []
    for i in range(n):
        origin = AIRPORTS[i % len(AIRPORTS)]
        dest = AIRPORTS[(i + 3) % len(AIRPORTS)]
        klass = CLASSES[i % 2]
        start = _iso(1 + (i % 27))
        end = _iso(1 + (i % 27), 23)
        item = {
            "PK": origin,
            "SK": f"{dest}#{start}#{klass}",
            "type": "fare",
            "origin": origin,
            "dest": dest,
            "start": start,
            "end": end,
            "class": klass,
            "GSI1PK": dest,
            "GSI1SK": f"{origin}#{start}",
        }
        m = marshal_item(item)
        m["__id"] = {}  # malformed no-type attribute, dropped by the codec
        items.append(m)
    return items


def gen_flights(n: int = 13) -> list[dict]:
    """Trip headers (segId=0) and leg items (isSegment, segId>=1)."""
    items = []
    flight_no = 100
    i = 0
    while len(items) < n:
        flight_no += 17
        origin = AIRPORTS[i % len(AIRPORTS)]
        mid = AIRPORTS[(i + 2) % len(AIRPORTS)]
        dest = AIRPORTS[(i + 5) % len(AIRPORTS)]
        # odd trips: out-of-range years for late-data tests (SURVEY §1.3)
        year = {0: 2021, 1: 2021, 2: 2018, 3: 2023}[i % 4]
        depart = _iso(2 + (i % 25), 6 + (i % 12), year=year)
        header = {
            "PK": origin,
            "SK": f"{origin}#{depart}#{flight_no}#0",
            "type": "flight",
            "origin": origin,
            "dest": dest,
            "depart": depart,
            "GSI2PK": str(flight_no),
            "GSI2SK": "0",
        }
        if i % 2 == 0:
            # direct flight header: segments as a stringified display set
            header["segments"] = "{%s, %s}" % (mid, dest)
            m = marshal_item(header)
        else:
            # nonstop header: segments as a real number → N type
            header["segments"] = 1
            m = marshal_item(header)
        m["__id"] = {}
        items.append(m)
        if len(items) >= n:
            break
        leg = {
            "PK": origin,
            "SK": f"{mid}#{_iso(2 + (i % 25), 9 + (i % 10), year=year)}#{flight_no}#1",
            "type": "flight",
            "origin": mid,
            "dest": dest,
            "depart": _iso(2 + (i % 25), 9 + (i % 10), year=year),
            "number": flight_no,  # N-typed on flights
            "isSegment": True,
            "segId": 1,
            "GSI2PK": str(flight_no),
            "GSI2SK": "1",
        }
        m = marshal_item(leg)
        m["__id"] = {}
        items.append(m)
        i += 1
    return items


def gen_assignments(n: int = 4) -> list[dict]:
    items = []
    for i in range(n):
        pax = PASSENGERS[i % 2]
        flight_no = 117 + 17 * (i % 3)
        depart = _iso(5 + i, 8)
        seat = f"{i + 1}{'AB'[i % 2]}"
        item = {
            "PK": pax,
            "SK": f"{depart}#{flight_no}#{2}#{seat}",
            "type": "assignment",
            "passenger": pax,
            "depart": depart,
            "number": str(flight_no),  # S-typed on assignments (dirty case)
            "segId": 2,
            "seat": seat,
            "SSR": "[wheelchair, vegan]" if i % 2 == 0 else "[]",
            # un-substituted template literal preserved as data on half:
            "GSI2PK": "${number}" if i < 2 else str(flight_no),
            "GSI2SK": f"2#{seat}",
        }
        m = marshal_item(item)
        m["__id"] = {}
        items.append(m)
    return items


def gen_bookings(n: int = 1) -> list[dict]:
    items = []
    for i in range(n):
        pax = PASSENGERS[i % 2]
        depart = _iso(5 + i, 8)
        item = {
            "PK": pax,
            "SK": f"{depart}#{117}",
            "type": "booking",
            "passenger": pax,
            "depart": depart,
            "segments": 2,  # N-typed on bookings (vs S on direct flights)
        }
        m = marshal_item(item)
        m["__id"] = {}
        items.append(m)
    return items


def gen_corpus(scale: int = 1) -> list[str]:
    """DynamoDB-JSON item strings: 40×scale items, 22/13/4/1 ratio."""
    items = (
        gen_fares(22 * scale)
        + gen_flights(13 * scale)
        + gen_assignments(4 * scale)
        + gen_bookings(1 * scale)
    )
    return [json.dumps(m, sort_keys=True) for m in items]


def probe_item() -> str:
    """Analog of the reference's manual E2E probe item
    (assets/dynamodb-test-item/item.json: a fare JFK→DEN on 2021-12-12)."""
    item = {
        "PK": "JFK",
        "SK": "DEN#2021-12-12T00:00:00#nonstop",
        "type": "fare",
        "origin": "JFK",
        "dest": "DEN",
        "start": "2021-12-12T00:00:00",
        "end": "2021-12-12T23:59:59",
        "class": "nonstop",
        "GSI1PK": "DEN",
        "GSI1SK": "JFK#2021-12-12T00:00:00",
    }
    return json.dumps(marshal_item(item), sort_keys=True)


def gen_cdc_events(scale: int = 1) -> list[dict]:
    """CDC replay covering every FIXTURES.md F3 scenario.

    Returns dicts: seq, event_name, event_ts, pk, sk, new_image_json
    (NULL for REMOVE — stream view type NEW_IMAGE).
    """
    corpus = gen_corpus(scale)
    events = []
    seq = 0

    def emit(name: str, item_json: str | None, pk: str, sk: str):
        nonlocal seq
        seq += 1
        events.append(
            {
                "seq": seq,
                "event_name": name,
                "event_ts": f"2021-09-01T00:{seq % 60:02d}:{seq % 10:02d}",
                "pk": pk,
                "sk": sk,
                "new_image_json": item_json,
            }
        )

    # 1. bulk INSERTs of the corpus
    for s in corpus:
        d = json.loads(s)
        emit("INSERT", s, d["PK"]["S"], d["SK"]["S"])

    # 2. INSERT → MODIFY same key: latest wins
    first = json.loads(corpus[0])
    modified = dict(first)
    modified["class"] = {"S": "direct"}
    emit("MODIFY", json.dumps(modified, sort_keys=True), first["PK"]["S"], first["SK"]["S"])

    # 3. INSERT → REMOVE: key absent from final index
    second = json.loads(corpus[1])
    emit("REMOVE", None, second["PK"]["S"], second["SK"]["S"])

    # 4. at-least-once duplicate delivery of one event (idempotency)
    third = json.loads(corpus[2])
    emit("MODIFY", corpus[2], third["PK"]["S"], third["SK"]["S"])
    events.append(dict(events[-1]))  # exact duplicate, same seq

    # 5. late INSERT of the probe item
    p = json.loads(probe_item())
    emit("INSERT", probe_item(), p["PK"]["S"], p["SK"]["S"])

    return events
