"""Interleaved A/B bisect for the `cep_streaming` bench query
(VERDICT r13 item 2).

The driver's official bench run recorded `cep_streaming` below the
95-180k events/s band two rounds running (r12: flagged; r13: 82.7k),
while the builder's same-session re-probes were in-band. Round 13 DID
touch `streaming/cep_stream.py` (reorder hold, PREV/NEXT nav, NEXT
holdback), so per the r12 verdict's own rule a second consecutive
same-sign flag requires a CODE bisect, not another solo adjudication.

Protocol (the `cep_match_recognize_all_rows` protocol from round 9):
run the EXACT bench replay (4-replica billing stream, availableNow,
noop sink, shuffle=8, n_buckets=32) under r12 code and under HEAD
code, interleaved A/B/A/B x5 on the same host in fresh subprocesses,
each subprocess also timing the settled `text_fingerprint` control at
sf0.1 so host drift is visible. min-of-5 per variant decides:

- HEAD min  > 1.25x r12 min with controls level  -> code regression.
- both mins in-band / within noise                -> host, not code.

Usage:
  python tools/cep_streaming_bisect.py            # orchestrate (needs
                                                  # .bisect/r12 worktree)
  python tools/cep_streaming_bisect.py --run ROOT SRC OUT.json
                                                  # one child sample
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R12 = os.path.join(REPO, ".bisect", "r12")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ROUNDS = 5


def child(root: str, src: str, out_path: str) -> None:
    """One subprocess: fresh JVM, warmup replay, 2 timed replays, and
    3 control runs. Imports resolve from ``root`` (r12 worktree or
    HEAD repo) — sys.path already ordered by the parent."""
    from flink_cep_examples_spark.session import get_spark
    from flink_cep_examples_spark.plans.pattern import billing_pattern
    from flink_cep_examples_spark.streaming import match_pattern_stream
    from flink_cep_examples_spark.queries import QUERIES, load_all

    spark = get_spark(
        app_name="cep-streaming-bisect",
        master=f"local[{CPUS}]",
        shuffle_partitions=8,
    )
    spark.sparkContext.setLogLevel("ERROR")
    schema = spark.read.parquet(src).schema

    def run_stream(chk: str) -> float:
        stream = spark.readStream.schema(schema).parquet(src)
        out = match_pattern_stream(
            stream,
            billing_pattern(emit_timeouts=True),
            "6 minutes",
            n_buckets=32,
        )
        t0 = time.perf_counter()
        q = (
            out.writeStream.outputMode("append")
            .format("noop")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return time.perf_counter() - t0

    load_all()
    control_fn = QUERIES["text_fingerprint"]
    with tempfile.TemporaryDirectory() as tmp:
        run_stream(f"{tmp}/warmup")
        samples = [run_stream(f"{tmp}/chk1"), run_stream(f"{tmp}/chk2")]
    controls = []
    for _ in range(3):
        t0 = time.perf_counter()
        control_fn(spark, SF_DIR).collect()
        controls.append(time.perf_counter() - t0)
    with open(out_path, "w") as f:
        json.dump(
            {
                "root": root,
                "samples": [round(s, 3) for s in samples],
                "control_min": round(min(controls), 3),
            },
            f,
        )
    spark.stop()


def orchestrate() -> int:
    if not os.path.isdir(R12):
        print(
            "missing r12 worktree: git worktree add .bisect/r12 0e82ed9",
            file=sys.stderr,
        )
        return 2
    with tempfile.TemporaryDirectory() as tmp:
        # Materialize the bench's exact 4-replica source ONCE (HEAD
        # code; the billing schema is identical across both variants).
        src = f"{tmp}/billing"
        prep = (
            "import sys; sys.path.insert(0, %r)\n"
            "from flink_cep_examples_spark.session import get_spark\n"
            "from flink_cep_examples_spark.sources.billing import "
            "events_as_billing\n"
            "from pyspark.sql import functions as F\n"
            "spark = get_spark(app_name='bisect-prep', "
            "master='local[%s]', shuffle_partitions=8)\n"
            "spark.sparkContext.setLogLevel('ERROR')\n"
            "b = events_as_billing(spark, %r)\n"
            "rep = (b.withColumn('r', F.explode(F.array(*[F.lit(i) "
            "for i in range(4)])))\n"
            "       .withColumn('id', F.concat_ws('#', 'id', 'r'))"
            ".drop('r'))\n"
            "n = rep.count()\n"
            "rep.coalesce(4).write.parquet(%r)\n"
            "print('events:', n)\n" % (REPO, CPUS, SF_DIR, src)
        )
        r = subprocess.run(
            [sys.executable, "-c", prep], capture_output=True, text=True
        )
        if r.returncode != 0:
            print(r.stderr[-2000:], file=sys.stderr)
            return 2
        n_events = int(r.stdout.strip().rsplit(" ", 1)[-1])
        print(f"source ready: {n_events} events", flush=True)

        results: dict[str, list[dict]] = {"r12": [], "head": []}
        for i in range(ROUNDS):
            for name, root in (("r12", R12), ("head", REPO)):
                out = f"{tmp}/{name}_{i}.json"
                env = dict(os.environ, PYTHONPATH=root)
                r = subprocess.run(
                    [
                        sys.executable,
                        os.path.abspath(__file__),
                        "--run",
                        root,
                        src,
                        out,
                    ],
                    env=env,
                    capture_output=True,
                    text=True,
                )
                if r.returncode != 0:
                    print(r.stderr[-2000:], file=sys.stderr)
                    return 2
                with open(out) as f:
                    rec = json.load(f)
                results[name].append(rec)
                print(
                    f"[round {i + 1}/{ROUNDS}] {name}: "
                    f"samples={rec['samples']} "
                    f"control={rec['control_min']}",
                    flush=True,
                )

        summary = {}
        for name in ("r12", "head"):
            allsamp = [s for rec in results[name] for s in rec["samples"]]
            ctrl = [rec["control_min"] for rec in results[name]]
            summary[name] = {
                "min": min(allsamp),
                "median": sorted(allsamp)[len(allsamp) // 2],
                "events_per_sec": round(n_events / min(allsamp)),
                "control_min": min(ctrl),
                "control_max": max(ctrl),
            }
        summary["head_vs_r12_min"] = round(
            summary["head"]["min"] / summary["r12"]["min"], 3
        )
        print(json.dumps(summary, indent=1))
        return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        # parent already set PYTHONPATH=root; make sure it wins over cwd
        sys.path.insert(0, sys.argv[2])
        child(sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        raise SystemExit(orchestrate())
