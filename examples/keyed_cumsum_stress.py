"""Key-cardinality stress for the keyed blocked_cumsum machinery
(VERDICT r06 "Next round" #7).

exact_quantiles routes per-key running totals through
operators/ranks.blocked_cumsum, whose offset table is
``n_tasks x n_groups`` rows and is BROADCAST back to the fact side.
The round-6 claim was "bounded at ANY key cardinality" — this script
measures it where the claim is weakest: the 100k-key end, where the
offset table is no longer tiny (32 tasks x 100k keys = 3.2M rows), and
compares against the plain ``Window.partitionBy(keys)`` strategy that
high-cardinality keys are supposed to prefer.

Synthetic input via spark.range (no disk): value = near-unique double
(the adversarial near-unique-cents domain), key = id % n_keys.

Run: python examples/keyed_cumsum_stress.py [rows,...] [keys,...] [strategies]
Defaults: rows 1e6,1e7,1e8 x keys 1,10,100000, strategies blocked,window.
(Pass "blocked" alone for the 100M single-key case — the plain window
there is the single-task funnel the operator exists to avoid, and takes
tens of minutes by itself.)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import Window
from pyspark.sql import functions as F

from ubparquet_spark.session import get_session

PROBS = {"p50": 0.5, "p95": 0.95}


def blocked(df, keys):
    from ubparquet_spark.operators.quantiles import exact_quantiles

    return exact_quantiles(
        df, keys, "v", PROBS, high_cardinality_keys=False
    )


def plain_window(df, keys):
    """The strategy blocked_cumsum replaced: per-key ordered window over
    the distinct-value distribution. Right for HIGH-cardinality keys
    (per-key domains are small); a single-task funnel for low ones."""
    dist = df.select(*keys, F.col("v").cast("double").alias("_v")).groupBy(
        *keys, "_v"
    ).agg(F.count(F.lit(1)).alias("_c"))
    w = (
        Window.partitionBy(*keys)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dist = dist.withColumn("_cum", F.sum("_c").over(w)).withColumn(
        "_n", F.sum("_c").over(Window.partitionBy(*keys))
    )
    aggs = [F.max("_n").alias("_n")]
    for name, p in PROBS.items():
        h = (F.col("_n") - 1) * F.lit(float(p))
        aggs.append(
            F.min(F.when(F.col("_cum") >= F.floor(h) + 1, F.col("_v"))).alias(
                f"_lo_{name}"
            )
        )
        aggs.append(
            F.min(F.when(F.col("_cum") >= F.ceil(h) + 1, F.col("_v"))).alias(
                f"_hi_{name}"
            )
        )
    out = dist.groupBy(*keys).agg(*aggs)
    cols = [*keys]
    for name, p in PROBS.items():
        h = (F.col("_n") - 1) * F.lit(float(p))
        frac = h - F.floor(h)
        lo, hi = F.col(f"_lo_{name}"), F.col(f"_hi_{name}")
        cols.append((lo + (hi - lo) * frac).alias(name))
    return out.select(*cols, F.col("_n").alias("n_rows"))


def main() -> None:
    rows_list = [
        int(float(x))
        for x in (sys.argv[1] if len(sys.argv) > 1 else "1e6,1e7,1e8").split(",")
    ]
    keys_list = [
        int(float(x))
        for x in (sys.argv[2] if len(sys.argv) > 2 else "1,10,100000").split(",")
    ]
    strategies = (
        sys.argv[3] if len(sys.argv) > 3 else "blocked,window"
    ).split(",")
    spark = get_session("keyed-cumsum-stress")
    print(f"{'rows':>12} {'n_keys':>8} {'blocked_s':>10} {'window_s':>10}")
    for n in rows_list:
        for k in keys_list:
            df = spark.range(n).select(
                (F.col("id") % k).alias("g"),
                # near-unique synthetic cents: id * prime mod big, /100
                ((F.col("id") * 7919) % 99999989 / 100.0).alias("v"),
            )
            out = {"blocked": float("nan"), "window": float("nan")}
            for label, fn in (("blocked", blocked), ("window", plain_window)):
                if label not in strategies:
                    continue
                t0 = time.perf_counter()
                res = fn(df, ["g"]).collect()
                out[label] = time.perf_counter() - t0
                assert len(res) == k
            print(
                f"{n:>12} {k:>8} {out['blocked']:>10.2f} {out['window']:>10.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
