"""Measure what Z-order layout buys: file-stat pruning for 2-D
predicates.

Writes the orders table three ways — unsorted, linearly sorted by
o_custkey, and sorted by the Morton key from
operators/advanced.zorder_layout — into N_FILES parquet files each,
then reads every file's footer min/max stats for (o_custkey, day) and
counts how many files a 2-D box predicate could prune WITHOUT reading
data. This is exactly the skipping decision Spark/Delta/Iceberg make
from stats; the fractions go into SCALE.md.

Usage: python tools/zorder_prune.py [--sf-dir /root/testdata/sf0.1]
       [--files 64] [--boxes 50]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = 64


def file_stats(path: str, cols: tuple[str, str]) -> list[dict]:
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                cname = col.path_in_schema
                if cname in cols and col.statistics is not None:
                    st = col.statistics
                    lo[cname] = st.min if lo[cname] is None \
                        else min(lo[cname], st.min)
                    hi[cname] = st.max if hi[cname] is None \
                        else max(hi[cname], st.max)
        out.append({"lo": lo, "hi": hi})
    return out


def pruned_fraction(stats: list[dict], boxes: list[dict],
                    cols: tuple[str, str]) -> float:
    """Mean fraction of files whose [min,max] box does NOT intersect
    the predicate box (i.e. provably skippable from stats alone)."""
    fr = []
    for b in boxes:
        skipped = 0
        for s in stats:
            hit = all(
                s["lo"][c] is not None
                and not (s["hi"][c] < b[c][0] or s["lo"][c] > b[c][1])
                for c in cols)
            if not hit:
                skipped += 1
        fr.append(skipped / len(stats))
    return sum(fr) / len(fr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--files", type=int, default=N_FILES)
    ap.add_argument("--boxes", type=int, default=50)
    ap.add_argument("--out", default="/tmp/zorder_prune")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mapreduce_go_spark.operators.advanced import zorder_layout
    from mapreduce_go_spark.session import get_spark

    spark = get_spark("zorder_prune")
    z = zorder_layout(spark, args.sf_dir)  # o_orderkey, o_custkey, day, zkey
    cols = ("o_custkey", "day")
    from mapreduce_go_spark.operators.advanced import (ZORDER_BITS,
                                                       _zspread_sql)
    dom0 = {c: tuple(z.agg(F.min(c), F.max(c)).collect()[0]) for c in cols}
    # rank-normalized variant: both dims scaled to the full bit budget
    # (raw custkey uses only 11 of 12 bits, so its leading bit is
    # constant and the leading zkey bits over-resolve day)
    top = (1 << ZORDER_BITS) - 1
    zn = z.selectExpr(
        "*",
        f"cast(((o_custkey - {dom0['o_custkey'][0]}) * {top})"
        f" div {dom0['o_custkey'][1] - dom0['o_custkey'][0]} AS int)"
        " AS ckn",
        f"cast(((day - {dom0['day'][0]}) * {top})"
        f" div {dom0['day'][1] - dom0['day'][0]} AS int) AS dayn",
    ).selectExpr(
        "o_orderkey", "o_custkey", "day",
        f"({_zspread_sql('ckn')}) + 2 * ({_zspread_sql('dayn')})"
        " AS zkey_norm")
    shutil.rmtree(args.out, ignore_errors=True)
    layouts = {
        "unsorted": z.repartition(args.files),
        "linear_custkey": z.repartitionByRange(args.files, "o_custkey",
                                               "o_orderkey"),
        "zorder": z.repartitionByRange(args.files, "zkey", "o_orderkey"),
        "zorder_norm": zn.repartitionByRange(args.files, "zkey_norm",
                                             "o_orderkey"),
    }
    for name, df in layouts.items():
        df.write.mode("overwrite").parquet(os.path.join(args.out, name))

    # deterministic predicate sets, ~3% of the domain per constrained
    # side: a 2-D box, a custkey-only range, and a day-only range —
    # the point of Z-order is pruning on EITHER dimension, where a
    # linear sort only serves its leading column
    dom = {c: tuple(z.agg(F.min(c), F.max(c)).collect()[0]) for c in cols}

    def make_boxes(constrained: tuple[str, ...]) -> list[dict]:
        boxes = []
        for i in range(args.boxes):
            b = {}
            for j, c in enumerate(cols):
                lo, hi = dom[c]
                if c in constrained:
                    span = max(1, (hi - lo) // 32)
                    start = lo + ((i * 7919 + j * 104729)
                                  % max(1, hi - lo - span))
                    b[c] = (start, start + span)
                else:
                    b[c] = (lo, hi)  # unconstrained
            boxes.append(b)
        return boxes

    kinds = {"box_2d": make_boxes(cols),
             "custkey_only": make_boxes(cols[:1]),
             "day_only": make_boxes(cols[1:])}
    result = {"files": args.files, "boxes": args.boxes, "pruned": {}}
    for name in layouts:
        st = file_stats(os.path.join(args.out, name), cols)
        result["pruned"][name] = {
            kind: round(pruned_fraction(st, bx, cols), 3)
            for kind, bx in kinds.items()}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
