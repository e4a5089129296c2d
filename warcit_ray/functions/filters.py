"""Include/exclude filtering (reference M2, warcit.py:344-349,466-476).

Truth table reproduced exactly:
  include AND exclude set: keep if include matches; else DROP if exclude
    matches; else keep.
  include only: keep iff include matches.
  exclude only: drop iff exclude matches.
Patterns and filenames are lowercased; fnmatch semantics; match is on
the FULL filename (not the URL).
"""

from __future__ import annotations

import fnmatch
import re

import numpy as np


class IncludeExclude:
    def __init__(self, include: list[str] | str | None, exclude: list[str] | str | None):
        def compile_list(pats):
            if pats is None:
                return None
            if isinstance(pats, str):
                pats = pats.split(",")
            return [re.compile(fnmatch.translate(p.lower())) for p in pats]

        self.include = compile_list(include)
        self.exclude = compile_list(exclude)

    @staticmethod
    def _match_any(name: str, rxs) -> bool:
        return any(rx.match(name) for rx in rxs)

    def keep(self, filename: str) -> bool:
        name = filename.lower()
        if self.include and self.exclude:
            if self._match_any(name, self.include):
                return True
            return not self._match_any(name, self.exclude)
        if self.include:
            return self._match_any(name, self.include)
        if self.exclude:
            return not self._match_any(name, self.exclude)
        return True

    def mask(self, filenames) -> np.ndarray:
        """Boolean keep-mask for a batch of filenames."""
        return np.fromiter((self.keep(f) for f in filenames), dtype=bool, count=len(filenames))
