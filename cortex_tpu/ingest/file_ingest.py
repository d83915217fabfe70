"""File ingest: watch-dir scan -> chunk -> nodes -> batch store.

Parity: cortex-core/src/briefing/ingest.rs:13-70+ — scan a watch
directory for `.md`/`.txt` files, chunk each document (embedding quality
degrades past ~2000 chars, types.rs:136-137), store chunk nodes with
shared tags, then move the file to `processed/`. Chunks from one file
are embedded as ONE device batch via `Cortex.store_batch` instead of
the reference's per-chunk embed calls.
"""

from __future__ import annotations

import os
import re
import shutil
import time
from dataclasses import dataclass, field
from typing import List, Optional

CHUNK_TARGET_CHARS = 1600
CHUNK_MAX_CHARS = 2000
SUPPORTED_EXTENSIONS = (".md", ".txt")


def chunk_text(text: str, target: int = CHUNK_TARGET_CHARS,
               hard_max: int = CHUNK_MAX_CHARS) -> List[str]:
    """Paragraph-preserving chunker. Splits on blank lines, packs
    paragraphs up to `target` chars, hard-splits any paragraph longer
    than `hard_max` on sentence-ish boundaries."""
    paragraphs = [p.strip() for p in re.split(r"\n\s*\n", text) if p.strip()]
    pieces: List[str] = []
    for p in paragraphs:
        if len(p) <= hard_max:
            pieces.append(p)
            continue
        # hard split long paragraph on sentence boundaries, then raw
        sentences = re.split(r"(?<=[.!?])\s+", p)
        cur = ""
        for s in sentences:
            if len(s) > hard_max:
                # flush accumulated text FIRST so document order holds
                if cur:
                    pieces.append(cur)
                    cur = ""
                while len(s) > hard_max:
                    pieces.append(s[:hard_max])
                    s = s[hard_max:]
            if cur and len(cur) + 1 + len(s) > hard_max:
                pieces.append(cur)
                cur = s
            else:
                cur = f"{cur} {s}".strip()
        if cur:
            pieces.append(cur)
    # pack pieces into chunks of ~target chars
    chunks: List[str] = []
    cur = ""
    for piece in pieces:
        if cur and len(cur) + 2 + len(piece) > target:
            chunks.append(cur)
            cur = piece
        else:
            cur = f"{cur}\n\n{piece}".strip()
    if cur:
        chunks.append(cur)
    return chunks


@dataclass
class FileIngestReport:
    files_processed: int = 0
    nodes_created: int = 0
    errors: List[str] = field(default_factory=list)


class FileIngest:
    """Scans `watch_dir` once per call; each supported file becomes a
    batch of chunk nodes, the file moves to `watch_dir/processed/`
    (ingest.rs:39+)."""

    def __init__(self, cortex, watch_dir: str, *, kind: str = "fact",
                 agent: str = "file-ingest", importance: float = 0.4):
        self.cortex = cortex
        self.watch_dir = watch_dir
        self.processed_dir = os.path.join(watch_dir, "processed")
        self.kind = kind
        self.agent = agent
        self.importance = importance

    def scan_once(self) -> FileIngestReport:
        report = FileIngestReport()
        if not os.path.isdir(self.watch_dir):
            return report
        os.makedirs(self.processed_dir, exist_ok=True)
        for name in sorted(os.listdir(self.watch_dir)):
            path = os.path.join(self.watch_dir, name)
            if not os.path.isfile(path):
                continue
            if not name.lower().endswith(SUPPORTED_EXTENSIONS):
                continue
            try:
                report.nodes_created += self._ingest_file(path, name)
                report.files_processed += 1
                self._move_processed(path, name)
            except Exception as e:  # log-and-continue (serve.rs posture)
                report.errors.append(f"{name}: {e}")
        return report

    def _ingest_file(self, path: str, name: str) -> int:
        from ..types import Node, Source  # local import avoids cycle

        with open(path, "r", encoding="utf-8", errors="replace") as f:
            text = f.read()
        chunks = chunk_text(text)
        if not chunks:
            return 0
        stem = os.path.splitext(name)[0]
        nodes = []
        for i, chunk in enumerate(chunks):
            title = f"{stem} ({i + 1}/{len(chunks)})" if len(chunks) > 1 \
                else stem
            n = Node.new(self.kind, title[:256], chunk,
                         Source(agent=self.agent, channel="file"),
                         self.importance)
            n.tags = ["ingested", f"file-{_slug(stem)}"[:64]]
            n.metadata = {"source_file": name, "chunk": i,
                          "chunks_total": len(chunks)}
            nodes.append(n)
        self.cortex.store_batch(nodes, actor="file-ingest")
        return len(nodes)

    def _move_processed(self, path: str, name: str) -> None:
        dest = os.path.join(self.processed_dir, name)
        if os.path.exists(dest):
            stem, ext = os.path.splitext(name)
            dest = os.path.join(self.processed_dir,
                                f"{stem}.{int(time.time())}{ext}")
        shutil.move(path, dest)


def _slug(s: str) -> str:
    return re.sub(r"[^a-z0-9-]+", "-", s.lower()).strip("-") or "file"
