"""Named query plans exposed through ``__spark_entry__``.

Importing this package registers every query module; ``QUERIES`` /
``ORACLE`` are the registries the driver contract reads.
"""

from .registry import ORACLE, QUERIES, register

from . import relational  # noqa: E402,F401  (registration side effects)

__all__ = ["QUERIES", "ORACLE", "register"]


def _load_all() -> None:
    """Import every query module (idempotent)."""
    from . import relational  # noqa: F401

    for mod in (
        "joins",
        "windows",
        "scalars",
        "nested",
        "dedup",
        "similarity",
        "textstats",
        "eventtime",
        "multimodal",
        "extras",
        "analytics",
        "udfs",
        "subqueries",
        "maintenance",
    ):
        try:
            __import__(f"{__name__}.{mod}")
        except ImportError:
            pass


_load_all()
