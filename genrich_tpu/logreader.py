"""Peaks-only re-analysis from a -f log (-P mode).

Mirrors findPeaksOnly/callPeaksLog (Genrich.c:1277-1488, 5243-5288).
Implemented in logreader_impl milestone; placeholder until then.
"""

from __future__ import annotations

from .errors import ERRLOG, fatal
from .params import Params


def find_peaks_only(p: Params) -> None:
    raise NotImplementedError("-P mode lands with the logreader milestone")
