"""Targeted filtering of one benign Ray Data log line.

Ray's sort-based all-to-all operators (``sort`` / ``groupby`` shuffles)
materialize key ranges that received no rows as ZERO-COLUMN empty blocks,
which trips the streaming executor's schema-consistency warning
("Operator produced a RefBundle with a different schema ... new schema: .")
even when every user-code branch emits properly typed empty tables — this
repo's probe/mask/hits branches all do (reproduced with a plain
``rd.from_arrow(...).repartition(16).sort(k)`` on a 2-column toy table).

At scale those lines would drown real schema bugs, so the filter below
drops ONLY the empty-new-schema variant: a genuine mismatch (two non-empty
differing schemas) still warns.  Installed lazily and idempotently by the
pipelines that build sort/groupby graphs; driver-side only.
"""

from __future__ import annotations

import logging

_SCHEMA_MSG = "Operator produced a RefBundle with a different schema"


class _EmptySchemaMismatchFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        msg = record.getMessage()
        if _SCHEMA_MSG not in msg:
            return True
        # "new schema: <schema>." — keep unless the new schema is empty;
        # empty blocks print as "." (Arrow) or as a zero-column
        # PandasBlockSchema (pandas-block stages)
        tail = msg.split("new schema:", 1)[-1].strip()
        return not (
            tail.startswith(".")
            or tail.startswith("PandasBlockSchema(names=[], types=[])")
        )


_installed = False


def silence_empty_schema_warnings() -> None:
    """Idempotently install the filter on the streaming executor logger."""
    global _installed
    if _installed:
        return
    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptySchemaMismatchFilter())
    _installed = True
