"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init(...)`` itself before importing this module:
nothing here (or in skyway_ray) calls ``ray.init()``/``ray.shutdown()``.

* ``entry()`` — flagship filter→PIP-join→tile pipeline on the smoke-
  scale synthetic image fixture (the driver smoke-checks rows ≥ 0).
* ``queries()`` — one callable per implemented operator/pipeline from
  SURVEY.md §2 (see the ``skyway_ray/queries`` package).
* ``oracle_sql()`` — DuckDB-equivalent SQL for every hash-verifiable
  query (including ``minhash_exact``, which pins the full distributed
  MinHash+LSH pipeline at threshold 1.0 against a token-set window-min
  oracle); genuinely non-SQL-expressible ops (PIP join on irregular
  polygons, approximate-threshold MinHash dedup, SimHash, langid,
  fingerprints, flagship pipeline) are omitted and get the driver's
  rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# Ray workers resolve `skyway_ray` via the driver's cwd/PYTHONPATH at
# ray.init time — make both robust for drivers importing this module
# from elsewhere (workers spawned after this import inherit PYTHONPATH
# when the raylet starts later; already-started raylets rely on cwd).
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
if _REPO not in os.environ.get("PYTHONPATH", ""):
    os.environ["PYTHONPATH"] = (
        _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")).rstrip(os.pathsep)


def entry() -> Any:
    """Flagship pipeline at smoke scale; returns the per-tile stats."""
    from skyway_ray.fixtures import (ensure_boundaries_parquet,
                                     ensure_images_parquet)
    from skyway_ray.pipelines.flagship import flagship_pipeline

    images = ensure_images_parquet("smoke")
    boundaries = ensure_boundaries_parquet(50)
    return flagship_pipeline(images, boundaries, z=12)


def queries() -> dict[str, Callable[[str], Any]]:
    from skyway_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from skyway_ray.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
