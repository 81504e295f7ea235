"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC ingest pipeline at sf0.001 scale;
``queries()`` exposes every implemented operator/pipeline from
SURVEY.md §2 (plus the large-scale training-data ops); ``oracle_sql()``
provides the DuckDB-equivalent SQL for each SQL-expressible entry.

Ray is initialised by the driver before this module is imported — nothing
here (or in filters_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: CDC validate → LWW upsert over the deterministic
    synthetic change log (sf0.001-sized), returning the final lake table."""
    from filters_ray.pipelines.queries import cdc_upsert_demo

    return cdc_upsert_demo('/root/testdata/sf0.001')


def queries() -> dict[str, Callable[[str], Any]]:
    from filters_ray.pipelines.queries import ray_queries

    return ray_queries()


def oracle_sql() -> dict[str, str]:
    from filters_ray.pipelines.queries import oracle_sqls

    return oracle_sqls()
