"""skyway_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch reimplementation of the capabilities of MapRVA/skyway
(reference at /root/reference, v0.2.0) re-hosted as a distributed engine
over `ray.data.Dataset` pipelines: zero-copy Arrow `map_batches` stages,
actor pools for stateful steps (STRtree point-in-polygon join, kNN cell
index), and groupby/sort shuffles for the wide steps (tile stats, dedup,
top-k).

Layout:
    geo/        cell indexing (grid cells, S2, Hilbert), web-mercator tiles,
                STRtree, vectorized point-in-polygon
    filters/    OSMFilter DSL parser + vectorized executor, CEL subset
    stages/     Ray Data stage callables (geotag, cell-encode, filter,
                PIP join, kNN, tiling, dedup, top-k)
    functions/  scalar/batch kernels (OPL codec, o5m varint, image codec,
                text analysis, minhash/simhash, ANN)
    io/         sources & sinks (OPL / OSM-JSON / OSM-XML / parquet)
    pipelines/  assembled end-to-end pipelines (flagship filter→join→tile)
    state/      checkpoint + per-partition lineage for resumable runs

Nothing in this package calls ``ray.init()`` — the caller (driver, tests,
bench.py) owns the Ray session.
"""

__version__ = "0.1.0"
