"""Validation layer (M9/M12 — ref ``src/core/validation.py`` and the typed
exception hierarchy of ``src/core/exceptions.py``).

Instead of raising per row (which would tear down a distributed pipeline),
batch validators SPLIT input into (valid, rejects) — rejects carry a reason
column and flow to a side output, mirroring the reference's skip-log
(``spreadsheet_loader.py:1430-1437``). Strict mode = count rejects and
raise after aggregation (same pattern as stages/resolve.strict_gate).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

import pandas as pd

# ref validation.py:219-248 — part-number charset/length rules
ID_MAX_LEN = 50
ID_PATTERN = re.compile(r"^[A-Za-z0-9 ._\-]+$")
NAME_MAX_LEN = 255
BATCH_SIZE_MIN, BATCH_SIZE_MAX = 1, 10_000


class ValidationError(ValueError):
    """Typed validation failure (ref exceptions.py:7-92)."""


def validate_batch_size(n: int) -> int:
    """ref validation.py:283-313: batch size must be in [1, 10000]."""
    if not (BATCH_SIZE_MIN <= n <= BATCH_SIZE_MAX):
        raise ValidationError(f"batch size {n} outside "
                              f"[{BATCH_SIZE_MIN}, {BATCH_SIZE_MAX}]")
    return n


def split_valid_entities(batch: pd.DataFrame,
                         id_col: str = "number",
                         name_col: str = "name"):
    """(valid, rejects) split: id charset/length, name length (M9)."""
    ids = batch[id_col].fillna("").astype(str)
    names = batch[name_col].fillna("").astype(str)
    reasons = pd.Series("", index=batch.index, dtype=object)
    bad_empty = ids.str.len() == 0
    bad_long = ids.str.len() > ID_MAX_LEN
    bad_charset = ~ids.map(lambda s: bool(ID_PATTERN.fullmatch(s)) if s else False)
    bad_name = names.str.len() > NAME_MAX_LEN
    reasons[bad_name] = "name_too_long"
    reasons[bad_charset] = "id_charset"
    reasons[bad_long] = "id_too_long"
    reasons[bad_empty] = "id_empty"
    bad = reasons != ""
    rejects = batch[bad].assign(reject_reason=reasons[bad])
    return batch[~bad], rejects


def split_self_loops(edges: pd.DataFrame, parent: str = "parent",
                     child: str = "child"):
    """ref validation.py:267-280: reject parent == child edges."""
    bad = edges[parent] == edges[child]
    return edges[~bad], edges[bad].assign(reject_reason="self_loop")


def iso_to_unix(value, default: int = 0) -> int:
    """M12 (ref import_temporal_history.py:79-90): ISO string → unix
    seconds, falling back to ``default`` on any parse failure."""
    if value is None:
        return default
    try:
        s = str(value).strip().replace("Z", "+00:00")
        dt = datetime.fromisoformat(s)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp())
    except (ValueError, TypeError):
        return default
