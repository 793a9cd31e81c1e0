"""Pure-Python scaling control (no Spark): the hardware-noise bracket
for the N → 4N efficiency gate.

Runs the SAME extraction kernel (`_extract_one`) over the same
deterministic corpus with a plain multiprocessing pool at N and 4N
processes, each leg pinned to exactly that many CPUs — i.e. the
framework-free ceiling of this host.  If the Spark job's efficiency
tracks this control, the gap is the VM's noisy-neighbor window, not job
structure (BENCH/BASELINE.md records the control ranging 0.58-0.92 on
identical code across campaign windows).

Usage:  python BENCH/control.py [--docs 100000] [--pair 8 32]
Prints one JSON line: {"eff": ..., "docs_per_sec_N": ..., ...}
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _work(args: tuple[int, int, int]) -> int:
    start, count, seed = args
    from pdf_extractor2_spark.plans.extract_job import _extract_one
    from pdf_extractor2_spark.sources.corpus import make_doc_spec, render_payload

    ok = 0
    for i in range(start, start + count):
        spec = make_doc_spec(i, seed=seed, pdf_share=0.2)
        row = _extract_one(spec.url, render_payload(spec), 0)
        ok += 1 if row["success"] else 0
    return ok


def run_leg(cores: int, n_docs: int, seed: int, repeats: int) -> float:
    os.sched_setaffinity(0, set(range(cores)))
    chunk = 500
    tasks = [(s, min(chunk, n_docs - s), seed) for s in range(0, n_docs, chunk)]
    best = None
    for _ in range(repeats):
        with mp.get_context("spawn").Pool(cores) as pool:
            pool.map(_work, tasks[:2])  # warm: import + JIT caches per worker
            t0 = time.perf_counter()
            pool.map(_work, tasks)
            wall = time.perf_counter() - t0
        best = wall if best is None or wall < best else best
    return n_docs / best


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--pair", type=int, nargs=2, default=(8, 32))
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    lo, hi = args.pair

    tp = {}
    for cores in (lo, hi):
        tp[cores] = run_leg(cores, args.docs, 42, args.repeats)
    eff = round((tp[hi] / tp[lo]) / (hi / lo), 3)
    print(json.dumps({
        "metric": f"pure-python control efficiency {lo} -> {hi} cores",
        "eff": eff,
        f"docs_per_sec_{lo}": round(tp[lo], 1),
        f"docs_per_sec_{hi}": round(tp[hi], 1),
        "docs": args.docs,
        "repeats": args.repeats,
    }))
