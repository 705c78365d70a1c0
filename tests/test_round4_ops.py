"""Adversarial-input parity for the round-4 query block (pct_rank,
retention, doc_stats, type_entropy, gap_fill, triangles, char_jaccard):
the same Ray-vs-DuckDB comparison as test_oracle_parity, but over a
hand-crafted tiny corpus that plants the edge cases the sf tables
don't hit — single-row window partitions, single-event users, docs
with no tokenizable words, sub-trigram-length docs, non-contiguous
doc ids, self-loop and duplicate graph edges, all-tied values."""

import datetime as dt
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

NAMES = ["pct_rank", "retention", "doc_stats", "type_entropy",
         "gap_fill", "triangles", "char_jaccard",
         # late-round-4 block (same events/documents-only oracles);
         # edge cases: single-event users (empty trajectory step /
         # 1-point shoelace ring / slope_den = 0), duplicate
         # timestamps (event_id tiebreak), an unsplit quadtree root,
         # a planted ε-pair for clustering, docs with zero BM25 query
         # terms
         "heading_octants", "stay_points", "shoelace_area",
         "rolling_zscore", "trend_slopes", "adaptive_tiles", "gini",
         "bm25_topk", "group_sample", "spatial_clusters",
         # session-G block; edge cases: single-event users (degenerate
         # first=last OD trips), a midnight-exact timestamp (day //
         # boundary), a planted DBSCAN core triple + one true border
         # point + noise (the old ε-pair has deg 1 → noise now),
         # months with one order and a Dec→Jan year rollover,
         # a single-vector label (centroid = itself), zero-crossing
         # border segments
         "od_matrix", "cum_new_users", "kring_smooth", "geohash4",
         "dbscan", "border_crossings", "mom_revenue", "label_scatter",
         # session-H block; the edge fixture's single-event users hit
         # the no-pair / no-hop degenerate paths, the planted DBSCAN
         # triangle gives pair_dist_hist sub-ε bins and max_span a
         # multi-chunk-safe tiny run
         "max_span", "self_crossings", "haversine_legs",
         "pair_dist_hist", "bbox_extent",
         # session-I: tiny hub graph exercises hits' V=200 floor and
         # the all-nodes-start-at-1000 vs DISTINCT-u oracle h0 parity
         "hits",
         # round-5 block: the co-partitioned vertex-state rewrites
         # (sssp/kcore/assortativity/pagerank) and the chained
         # type-state colocation over the same tiny hub graph /
         # planted ε-triple — single-row state seeds, empty bad-node
         # rounds, isolated-core singletons, one-type pair tables
         "sssp", "kcore", "assortativity", "pagerank", "colocation",
         # session-G block: sequence DP + robust stats + sketches +
         # geometry over the same edge fixture — single-event users
         # (no MK pairs / no transitions), all users shorter than the
         # DTW/Hausdorff L=12 (both sides must emit EMPTY with stable
         # schemas), under-K Visvalingam passthrough, x-tied Theil-Sen
         # pairs (dx=0 skipped), event types outside the item
         # vocabulary (ignored, not KeyError), a click-less
         # cross-correlation (13 zero rows on BOTH sides), 4-nation
         # map-match segments (derived from the table, not a constant),
         # 3-row supplier/part spatial sides
         "mann_kendall", "theilsen_slope", "dtw_pairs",
         "hausdorff_pairs", "lttb_downsample", "visvalingam",
         "interval_stab", "xcorr_lags", "markov_entropy",
         "fano_factor", "itemset_triples", "merkle_levels",
         "cms_counts", "closest_pair", "map_match", "triangle_raster",
         "modularity", "clustering_coeff", "hilbert_range",
         "box_isect_area", "winnowing",
         # sequence-stat tail: single-event users (runs=1, zero
         # triples, R=0), duplicate values (median ties)
         "rs_range", "perm_counts", "runs_test", "lis_length",
         "quadkeys", "rich_club", "kmv_distinct", "visit_entropy",
         "radius_gyration", "max_gap", "ks_exact", "byte_entropy",
         "clark_evans", "bhattacharyya", "attribution_pairs",
         "tile_entropy", "interval_union", "simpson_tiles",
         "scan_stat", "box_cover_cells", "lag_cov", "longest_streak"]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: one single event (1-row everything: retention cohort of
    # itself, gap_fill span of one hour)
    rows.append((0, base, 1, "solo", 5.0))
    # user 2: events straddling hours and weeks, with floor(value)
    # ties inside one event_type (pct_rank tie runs) and a same-hour
    # duplicate (gap_fill per-hour max)
    for i, (hours, v) in enumerate([(0, 3.2), (0, 3.9), (1, 3.5),
                                    (50, -2.0), (400, 3.5), (400, 7.0)]):
        rows.append((10 + i, base + dt.timedelta(hours=hours), 2, "tie", v))
    # user 3: negative + zero values, its own type with ONE row
    # (percent_rank of a 1-row partition = 0.0)
    rows.append((30, base + dt.timedelta(hours=2), 3, "single", 0.0))
    rows.append((31, base + dt.timedelta(hours=3), 3, "tie", -3.7))
    # graph edges for triangles: event_id % 400 collides with
    # user_id % 400 (self-loop, dropped) and duplicate edges
    rows.append((402, base + dt.timedelta(hours=4), 2, "tie", 1.0))   # 2-2 self-loop
    rows.append((403, base + dt.timedelta(hours=5), 2, "tie", 1.0))   # 2-3
    rows.append((803, base + dt.timedelta(hours=6), 2, "tie", 1.0))   # dup 2-3
    rows.append((403, base + dt.timedelta(hours=7), 1, "tie", 1.0))   # 1-3
    rows.append((402, base + dt.timedelta(hours=8), 1, "tie", 1.0))   # 1-2 → triangle 1-2-3
    # user 9: every event_id ≡ 9 ≡ user_id (mod 400) → only self-loop
    # graph edges (dropped; the planted triangle stays unique).
    # (409, 1448009) derive to points ~0.63° apart → one ε=1.0
    # cluster pair for spatial_clusters; the three 'purchase' rows
    # feed gini (incl. a 0.0 value)
    rows.append((409, base + dt.timedelta(hours=9), 9, "geo", 1.0))
    rows.append((1448009, base + dt.timedelta(hours=10), 9, "geo", 1.0))
    rows.append((2009, base + dt.timedelta(hours=11), 9, "purchase", 2.5))
    rows.append((2409, base + dt.timedelta(hours=12), 9, "purchase", 0.0))
    rows.append((2809, base + dt.timedelta(hours=13), 9, "purchase", 7.25))
    # 6th user-9 event: a 50.0 spike so rolling_zscore flags ≥ 1 row
    # (an ALL-empty Ray result loses its schema to pass-through empty
    # blocks — real runs at sf≥0.01 are never empty, but the edge
    # fixture must not be either)
    rows.append((3209, base + dt.timedelta(hours=14), 9, "geo", 50.0))
    # planted DBSCAN constellation (derived lat/lon geometry):
    # 5000 / 130574 / 256148 are mutually ≤ 0.25° → each has 2
    # ε-neighbors → all CORE; 71574 is 0.949° from 5000 but > 1.0°
    # from the other two → deg 1 → BORDER of the 5000-cluster; the
    # old (409, 1448009) ε-pair has deg 1 each → NOISE under
    # minPts=3.  user_id = event_id % 400 keeps the triangle graph
    # untouched (self-loops drop).
    for i, eid in enumerate([5000, 130574, 256148, 71574]):
        rows.append((eid, base + dt.timedelta(hours=15 + i),
                     eid % 400, "geo", 1.0))
    # users 4 and 5: twelve events each → ONE complete DTW/Hausdorff
    # pair (pair=2) — all other users are shorter than L=12, so the
    # L-gate drops them on both sides; derived points sit ≥ 14.6° from
    # the planted dbscan constellation and add star edges only (no new
    # triangle).  x-hour ties inside user 4 exercise Theil-Sen's
    # dx=0 skip; 'click'/'purchase' rows give xcorr a non-empty lag 0.
    for j in range(12):
        rows.append((9000 + j, base + dt.timedelta(hours=20 + j // 2),
                     4, "click" if j % 2 else "purchase",
                     float((j * 7) % 5) + 0.25))
        rows.append((9100 + j, base + dt.timedelta(hours=20 + j),
                     5, "view", float((j * 3) % 4) - 1.5))
    ev = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    pq.write_table(ev, os.path.join(d, "events.parquet"))

    docs = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (2, "a a a a a a"),                                   # 1 distinct word
        (3, "!!! ??? ..."),      # no [a-z0-9] words → doc_stats drops it
        (4, "ab"),               # shorter than a trigram → no char grams
        (7, "zz yy xx ww"),      # id gap: pairs (4,5)/(5,6)/(6,7) absent
        (8, "spark window hash vector spark window"),  # BM25 query hits
    ]
    dt_tab = pa.table({
        "doc_id": pa.array([r[0] for r in docs], pa.int64()),
        "text": pa.array([r[1] for r in docs], pa.string()),
        "lang": pa.array(["en"] * len(docs), pa.string()),
        "source": pa.array(["t"] * len(docs), pa.string()),
        "n_chars": pa.array([len(r[1]) for r in docs], pa.int64()),
    })
    pq.write_table(dt_tab, os.path.join(d, "documents.parquet"))

    # nation: 4 keys → 4 derived border segments (border_crossings)
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2, 3], pa.int32()),
        "n_name": pa.array(["A", "B", "C", "D"], pa.string()),
        "n_regionkey": pa.array([0, 0, 1, 1], pa.int32()),
    }), os.path.join(d, "nation.parquet"))

    # orders: single-order months, a Dec→Jan year rollover, a
    # half-cent price (floor(x*100+0.5) edge) — mom_revenue
    odates = [dt.datetime(2023, 12, 31), dt.datetime(2024, 1, 1),
              dt.datetime(2024, 1, 31), dt.datetime(2024, 3, 15)]
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 2], pa.int64()),
        "o_orderstatus": pa.array(["O"] * 4, pa.string()),
        "o_totalprice": pa.array([100.005, 0.004, 250.0, 99.999],
                                 pa.float64()),
        "o_orderdate": pa.array(odates, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 4, pa.string()),
    }), os.path.join(d, "orders.parquet"))

    # embeddings: a single-vector label (centroid = itself, ssd 0),
    # negatives, and milli-quantization boundary values — label_scatter
    vecs = [[0.0005, -0.0005, 1.25, -3.5],
            [1.0, 2.0, 3.0, 4.0],
            [1.5, 2.5, 3.5, 4.5],
            [-1.0, -2.0, -3.0, -4.0]]
    # supplier/part: tiny spatial sides for triangle_raster /
    # box_isect_area (3 rows each; keys spread the derived shapes)
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["s1", "s2", "s3"], pa.string()),
        "s_nationkey": pa.array([0, 1, 2], pa.int32()),
    }), os.path.join(d, "supplier.parquet"))
    pq.write_table(pa.table({
        # keys equal to live event ids → identical derived centers,
        # so box_isect_area has guaranteed overlaps (403 is also a
        # DUPLICATED event id — per-row join semantics exercised)
        "p_partkey": pa.array([30, 403, 5000], pa.int64()),
        "p_name": pa.array(["p30", "p403", "p5000"], pa.string()),
    }), os.path.join(d, "part.parquet"))

    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([7, 1, 1, 1], pa.int32()),
    }), os.path.join(d, "embeddings.parquet"))
    return str(d)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", NAMES)
def test_edge_parity(name, edge_dir, ray_session):
    from skyway_ray.queries import ORACLE_SQL, QUERIES

    got = QUERIES[name](edge_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in ("events", "documents", "nation", "orders", "embeddings",
              "supplier", "part"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{edge_dir}/{t}.parquet')")
    want = con.sql(ORACLE_SQL[name]).df()
    g, w = _canon(got), _canon(want)
    assert list(g.columns) == list(w.columns)
    assert len(g) == len(w), f"{name}: {len(g)} vs {len(w)} rows"
    for c in g.columns:
        a, b = g[c].to_numpy(), w[c].to_numpy()
        if g[c].dtype.kind == "f" or w[c].dtype.kind == "f":
            assert np.array_equal(a, b), f"{name}.{c} float mismatch"
        else:
            assert (g[c] == w[c]).all(), f"{name}.{c} mismatch"


def test_dbscan_planted_roles(edge_dir, ray_session):
    """The planted constellation classifies exactly as designed:
    5000/130574/256148 CORE in one cluster (comp = min id = 5000),
    71574 BORDER of that cluster, the old ε-pair (409, 1448009)
    NOISE under minPts=3."""
    from skyway_ray.queries import QUERIES

    out = QUERIES["dbscan"](edge_dir).to_pandas().set_index("id")
    for eid in (5000, 130574, 256148):
        assert out.loc[eid, "role"] == 2 and out.loc[eid, "comp"] == 5000
    assert out.loc[71574, "role"] == 1
    assert out.loc[71574, "comp"] == 5000
    for eid in (409, 1448009):
        assert out.loc[eid, "role"] == 0 and out.loc[eid, "comp"] == -1


def test_intra_run_pairs_chunking():
    """The chunked pair generator emits exactly the brute-force
    (i < j) intra-run pair set, for every budget — including budgets
    that split a single row's pair slots across chunks."""
    import numpy as np

    from skyway_ray.queries import _intra_run_pairs

    rng = np.random.default_rng(7)
    for trial in range(20):
        runs = np.sort(rng.integers(0, 8, rng.integers(0, 40)))
        want = {(i, j) for i in range(len(runs))
                for j in range(i + 1, len(runs)) if runs[i] == runs[j]}
        for budget in (1, 2, 3, 7, 1_000_000):
            got = set()
            for ig, jg in _intra_run_pairs(runs, pair_budget=budget):
                assert len(ig) <= budget
                got.update(zip(ig.tolist(), jg.tolist()))
            assert got == want, (trial, budget)


def test_triangle_found(edge_dir, ray_session):
    """The planted 1-2-3 triangle (and only it) is reported, anchored
    at its minimum node."""
    from skyway_ray.queries import QUERIES

    out = QUERIES["triangles"](edge_dir).to_pandas()
    assert out.values.tolist() == [[1, 1]]
