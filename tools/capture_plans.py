"""Capture `explain("formatted")` for every LAZY headline query into
plans/<tag>/<query>_<suffix>.txt, from a PINNED fixture (sf0.001, the
same dir the PLANS.md snapshots use) so before/after pairs differ only
when the plan actually changed.

    python tools/capture_plans.py r14 before [repo_root]
    python tools/capture_plans.py r14 after

`repo_root` lets the BEFORE capture run against a clean worktree of the
previous round's HEAD while writing into the CURRENT repo's plans/ dir.

Compare a pair under the id-normalizer (same regexes the PLANS.md
digests use), so "plan unchanged" is a checkable assertion:

    python tools/capture_plans.py --diff plans/r14 before after
"""
from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def capture(tag: str, suffix: str, root: str) -> None:
    sys.path.insert(0, root)
    from opensearch_dynamodb_etl_cdk_spark.plans.snapshot import (
        SNAPSHOT_SF_DIR, formatted_plan, headline_queries)
    from opensearch_dynamodb_etl_cdk_spark.plans.catalog import CATALOG
    from opensearch_dynamodb_etl_cdk_spark.plans import catalog_dsl_tail
    from opensearch_dynamodb_etl_cdk_spark.session import get_spark

    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(f"plan-capture-{suffix}")
    # canonical cache state, exactly like the PLANS.md snapshot run
    spark.catalog.clearCache()
    catalog_dsl_tail._PQ_CACHE.clear()
    catalog_dsl_tail._IVFPQ_CACHE.clear()
    n = 0
    for name in headline_queries():
        entry = CATALOG[name]
        if getattr(entry, "eager", False):
            continue  # trainers execute inside fn(); no static plan
        try:
            df = entry.fn(spark, SNAPSHOT_SF_DIR)
        except Exception as e:  # noqa: BLE001
            print(f"SKIP {name}: {e}")
            continue
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(formatted_plan(df))
        n += 1
    print(f"wrote {n} plans to {out_dir} (*_{suffix}.txt)")
    spark.stop()


def diff(plan_dir: str, a: str, b: str) -> None:
    sys.path.insert(0, REPO)
    from opensearch_dynamodb_etl_cdk_spark.plans.snapshot import normalize

    names = sorted(
        f[: -len(f"_{a}.txt")]
        for f in os.listdir(plan_dir)
        if f.endswith(f"_{a}.txt")
    )
    changed, same, missing = [], [], []
    for name in names:
        pa = os.path.join(plan_dir, f"{name}_{a}.txt")
        pb = os.path.join(plan_dir, f"{name}_{b}.txt")
        if not os.path.exists(pb):
            missing.append(name)
            continue
        na = normalize(open(pa).read())
        nb = normalize(open(pb).read())
        (same if na == nb else changed).append(name)
    print(f"unchanged under normalizer: {len(same)}")
    for name in changed:
        print(f"CHANGED: {name}")
    for name in missing:
        print(f"MISSING {b}: {name}")


if __name__ == "__main__":
    if sys.argv[1] == "--diff":
        diff(sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        tag, suffix = sys.argv[1], sys.argv[2]
        root = sys.argv[3] if len(sys.argv) > 3 else REPO
        capture(tag, suffix, root)
