"""Query plans: the engine's declared operator inventory (SURVEY.md §2.2).

Each module registers queries into `registry`. Importing this package
loads all of them.
"""

from . import registry  # noqa: F401


def load_all() -> None:
    """Import every plan module so its queries register."""
    from . import (  # noqa: F401
        relational,
        joins,
        aggregates,
        windows,
        setops,
        json_array,
        udfs,
        pipeline_batch,
        sql_surface,
        streaming_batch,
        streaming_live,
        subqueries,
        tpch_extra,
        text,
        dedup,
        similarity,
        multimodal,
    )
