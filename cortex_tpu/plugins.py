"""Plugin system: user Python modules attached at configured points.

Parity: reference [[plugins]] config block (cortex-server
config.rs:282-286 — `PluginConfig{path, type}` with types "ingest" |
"linker_rule" | "briefing_section" | "export_format" | "classifier").
The reference declares the block; here plugins are live: each entry is
a Python file loaded via importlib whose module-level factory is
attached to the matching engine extension point:

  type               module must define           attached to
  ------------------ ---------------------------- -------------------------
  linker_rule        make_rule() -> obj with      AutoLinker config rules
                     .evaluate(node, other, score)
                     -> list[ProposedEdge]
  ingest             make_adapter() -> IngestAdapter   serve ingest loop
  briefing_section   make_section(cortex) ->      BriefingEngine
                     callable(agent_id) ->        extra_sections
                     (title, [node_ids])
  export_format      export(nodes, edges) -> str  `cortex export --format`
  classifier         classify(node) -> str|None   metadata["classification"]
                                                  set at store time

Plugin load failures are log-and-skip (the reference's degrade-
gracefully posture for optional subsystems).
"""

from __future__ import annotations

import importlib.util
import logging
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

log = logging.getLogger("cortex.plugins")

PLUGIN_TYPES = ("ingest", "linker_rule", "briefing_section",
                "export_format", "classifier")

_FACTORY = {
    "linker_rule": "make_rule",
    "ingest": "make_adapter",
    "briefing_section": "make_section",
    "export_format": "export",
    "classifier": "classify",
}


@dataclass
class LoadedPlugin:
    path: str
    ptype: str
    obj: Any
    name: str


@dataclass
class PluginSet:
    plugins: List[LoadedPlugin] = field(default_factory=list)
    errors: List[str] = field(default_factory=list)

    def by_type(self, ptype: str) -> List[LoadedPlugin]:
        return [p for p in self.plugins if p.ptype == ptype]

    @staticmethod
    def load(configs) -> "PluginSet":
        """configs: iterable with .path and .type attributes."""
        ps = PluginSet()
        for c in configs:
            ptype = getattr(c, "type", getattr(c, "ptype", ""))
            path = str(getattr(c, "path", ""))
            if ptype not in PLUGIN_TYPES:
                ps.errors.append(f"{path}: unknown plugin type {ptype!r}")
                continue
            try:
                obj = _load_module_attr(path, _FACTORY[ptype])
            except Exception as e:  # noqa: BLE001 — log-and-skip
                ps.errors.append(f"{path}: {e}")
                log.warning("plugin %s failed to load: %s", path, e)
                continue
            ps.plugins.append(LoadedPlugin(
                path=path, ptype=ptype, obj=obj,
                name=os.path.splitext(os.path.basename(path))[0]))
        return ps

    # ------------------------------------------------------------- attach
    def attach(self, cortex) -> int:
        """Wire loaded plugins into an embedded Cortex. Returns the
        number attached."""
        n = 0
        for p in self.by_type("linker_rule"):
            try:
                cortex.linker.config.rules.append(p.obj())
                n += 1
            except Exception as e:  # noqa: BLE001
                self.errors.append(f"{p.path}: make_rule failed: {e}")
        for p in self.by_type("classifier"):
            cortex.classifiers.append(p.obj)
            n += 1
        for p in self.by_type("briefing_section"):
            try:
                cortex.briefing_engine.extra_sections.append(
                    p.obj(cortex))
                n += 1
            except Exception as e:  # noqa: BLE001
                self.errors.append(f"{p.path}: make_section failed: {e}")
        return n

    def exporters(self) -> Dict[str, Any]:
        return {p.name: p.obj for p in self.by_type("export_format")}

    def adapters(self) -> List[Any]:
        out = []
        for p in self.by_type("ingest"):
            try:
                out.append(p.obj())
            except Exception as e:  # noqa: BLE001
                self.errors.append(f"{p.path}: make_adapter failed: {e}")
        return out


def _load_module_attr(path: str, attr: str):
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    name = f"cortex_plugin_{abs(hash(path)) & 0xFFFFFF:x}"
    spec = importlib.util.spec_from_file_location(name, path)
    if spec is None or spec.loader is None:
        raise ImportError(f"cannot load {path}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    if not hasattr(mod, attr):
        raise AttributeError(f"{path} does not define {attr}()")
    return getattr(mod, attr)
