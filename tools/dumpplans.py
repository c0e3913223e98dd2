"""Dump ``.explain("formatted")`` for registry queries to plans/r15/.

Usage:
    python tools/dumpplans.py --suffix before [--sf /root/testdata/sf0.1] q1 q2 ...

Writes ``plans/r15/<query>_<suffix>.txt`` for each named query (or every
bench HEADLINE query when none are named). Pure plan generation — nothing
is executed, so this is safe to run alongside other jobs.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--outdir", default=None)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from streaming_data_pipeline_with_iceberg_and_spark_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("dumpplans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    names = args.queries
    if not names:
        import bench

        names = list(bench.HEADLINE)

    outdir = args.outdir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"skip {name}: not in registry", file=sys.stderr)
            continue
        try:
            import contextlib
            import io

            df = fn(spark, args.sf)
            # eagerly-checkpointed results keep their real plan on
            # _spark_graft_source (io.checkpoint_release) — follow it so
            # the dump shows the computation, not `Scan ExistingRDD`
            df = getattr(df, "_spark_graft_source", df)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 - report and continue
            plan = f"ERROR building plan: {exc!r}\n"
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
