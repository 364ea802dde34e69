"""Typed pass properties (reference Utils/Properties.h + per-pass validation
like SVAO::create, reference Source/RenderPasses/SVAO/SVAO.cpp:83-100).

A pass declares its known keys with defaults; unknown keys warn (same
behavior as `logWarning("Unknown field ...")`, SVAO.cpp:97).
"""
from __future__ import annotations

import logging

log = logging.getLogger("rtsdm")


class Properties(dict):
    """A plain dict with Falcor-style validated consumption."""

    def consume(self, schema: dict, pass_name: str = "?") -> dict:
        """schema: key -> default. Returns merged config; warns on unknowns."""
        out = dict(schema)
        for k, v in self.items():
            if k in schema:
                out[k] = v
            else:
                log.warning("Unknown field '%s' in a %s dictionary", k, pass_name)
        return out
