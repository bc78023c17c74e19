"""Hygiene invariant (VERDICT r7 #5): operator-internal persisted
frames travel through explicit ``CacheHandle`` returns
(`functions/handles.py`), never as private attributes hung off
DataFrames — those silently vanish through any transformation. This
test greps the package source so the retired pattern cannot creep
back in.
"""

from __future__ import annotations

import os
import re

import gmall_flink_2021_spark as pkg

# an assignment (or read) of a private cache-ish attribute on any
# expression: ._foo_cache / ._foo_caches / ._edges_frame
_PATTERN = re.compile(
    r"\.\s*_[a-z_]+(?:_cache|_caches|_frame)\b")
# handles.py documents the retired pattern in its module docstring
_ALLOWED = {"handles.py"}


def test_no_dataframe_attribute_sidechannels():
    root = os.path.dirname(os.path.abspath(pkg.__file__))
    offenders: list[str] = []
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            if not fn.endswith(".py") or fn in _ALLOWED:
                continue
            path = os.path.join(dirpath, fn)
            with open(path) as fh:
                for i, line in enumerate(fh, 1):
                    if _PATTERN.search(line):
                        offenders.append(
                            f"{os.path.relpath(path, root)}:{i}: "
                            f"{line.strip()}")
    assert not offenders, (
        "DataFrame attribute side-channels found — return a "
        "CacheHandle instead:\n" + "\n".join(offenders))
