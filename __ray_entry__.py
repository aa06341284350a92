"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Fill these in as you implement operators from
SURVEY.md §2. Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``; the driver converts.

Ray is initialised by the driver BEFORE this module is imported: do not
call ``ray.init()`` / ``ray.shutdown()`` here, in the library code these
functions use, or inside the callables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# The driver may import this file from any cwd, and Ray workers spawned by the
# driver's session won't have this repo on their sys.path. Make the package
# importable for this process AND ship it by value to workers (cloudpickle),
# so no worker-side import of `demeter_ray` is ever needed.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _register_by_value() -> None:
    import demeter_ray

    demeter_ray.ship_code_to_workers()


_register_by_value()



def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0.

    Streams the documents table into the image+caption schema, decode-verifies
    every row (PSNR/caption invariant), and runs the fused spatial enrichment
    (cell index + PIP + kNN + elevation sampling) against the deterministic
    fixture fields/rasters.  Ray session is owned by the caller.
    """
    from demeter_ray.pipelines import flagship

    return flagship.entry_pipeline("/root/testdata/sf0.001")


def _registry() -> dict:
    import demeter_ray.pipelines.oracle_audio  # noqa: F401  (registers)
    import demeter_ray.pipelines.oracle_extra  # noqa: F401  (registers)
    import demeter_ray.pipelines.oracle_spatial  # noqa: F401  (registers)
    import demeter_ray.pipelines.oracle_text  # noqa: F401  (registers)
    import demeter_ray.pipelines.oracle_tpch  # noqa: F401  (registers)
    import demeter_ray.pipelines.oracle_window  # noqa: F401  (registers)
    from demeter_ray.pipelines.relational import QUERIES

    return QUERIES


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2.

    Each callable takes ``sf_dir`` (e.g. "/root/testdata/sf0.01") and
    returns a Dataset / pandas DataFrame / pyarrow Table. Name every
    computed/aggregate column so names match ``oracle_sql``.
    """
    # flagship_tile_assignments is registered with a FULL SQL oracle in
    # pipelines/oracle_spatial.py (decode-verify + spatial enrichment,
    # every tile-assignment column recomputed in SQL)
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """For each key in ``queries()``, equivalent ANSI SQL runnable by
    DuckDB on the same parquet tables (pre-registered views: region
    nation customer supplier part orders lineitem events documents
    embeddings). Omit for non-SQL-expressible ops → driver records a
    weaker rows-only check.
    """
    return {name: sql for name, (_fn, sql) in _registry().items() if sql is not None}
