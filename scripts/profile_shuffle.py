#!/usr/bin/env python
"""Profile the sort-based vs hash-bucket co-partition shuffle for the
LSH/setsim pipelines (VERDICT r3 item #7): same input, same session,
alternating order, best-of-N each, host steal evidence attached.

Usage: python scripts/profile_shuffle.py [n_docs] [repeats]
"""
import json
import sys
import time

import numpy as np
import pyarrow as pa


def corpus(n: int, dup_frac: float = 0.1, near_frac: float = 0.05,
           seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:04d}" for i in range(20_000)])
    base = n - int(n * dup_frac) - int(n * near_frac)
    texts = [" ".join(rng.choice(vocab, 60)) for _ in range(base)]
    ids = list(range(base))
    for j in range(int(n * dup_frac)):          # exact dups
        texts.append(texts[j % base])
        ids.append(10_000_000 + j)
    for j in range(int(n * near_frac)):         # near dups (tail noise)
        texts.append(texts[j % base] + " zz" + str(j))
        ids.append(20_000_000 + j)
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})


def main() -> None:
    import ray
    import ray.data

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    from bench import HostProbe
    from skyway_ray.functions.near_dup import minhash_lsh_dedup
    from skyway_ray.functions.setsim import setsim_join

    tab = corpus(n)
    probe = HostProbe()
    res: dict = {"n_docs": n, "repeats": repeats}

    def timed(fn) -> tuple[float, int]:
        best, rows = float("inf"), -1
        for _ in range(repeats):
            t0 = time.perf_counter()
            rows = fn().count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3), rows

    def mk_ds():
        return ray.data.from_arrow(tab).repartition(32)

    # alternate so a host phase shift hits both shuffles equally
    for shuffle in ("sort", "hash", "sort", "hash"):
        sec, rows = timed(lambda: minhash_lsh_dedup(
            mk_ds(), threshold=0.7, shuffle=shuffle))
        key = f"minhash_{shuffle}"
        res[key] = min(res.get(key, 9e9), sec)
        res[f"minhash_{shuffle}_rows"] = rows

    for shuffle in ("sort", "hash", "sort", "hash"):
        sec, rows = timed(lambda: setsim_join(
            mk_ds(), tau=0.8, ngram_words=3, broadcast_sketch_limit=0,
            shuffle=shuffle))
        key = f"setsim_{shuffle}"
        res[key] = min(res.get(key, 9e9), sec)
        res[f"setsim_{shuffle}_rows"] = rows

    res["host"] = probe.stop()
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
