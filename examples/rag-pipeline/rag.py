"""RAG pipeline backed by graph memory.

Parity: reference examples/rag-pipeline/*.py — ingest documents as
chunked nodes, retrieve with hybrid (vector x graph) search, and
assemble a context window for an LLM prompt.

Run: python examples/rag-pipeline/rag.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from cortex_tpu.api import Cortex
from cortex_tpu.ingest.file_ingest import chunk_text
from cortex_tpu.types import Edge, EdgeProvenance, Node, Source

DOCS = {
    "runbook.md": (
        "## Deploys\n\nAll services deploy through the blue-green "
        "pipeline with canary analysis.\n\n## Rollbacks\n\nRollbacks "
        "trigger automatically when the error budget burns too fast."),
    "oncall.md": (
        "## Paging\n\nSev1 incidents page the primary on-call within "
        "60 seconds.\n\n## Escalation\n\nUnacknowledged pages escalate "
        "to the secondary after five minutes."),
}


def ingest(cx: Cortex) -> dict:
    doc_ids = {}
    for name, text in DOCS.items():
        chunk_nodes = []
        for i, chunk in enumerate(chunk_text(text)):
            n = Node.new("fact", f"{name} chunk {i}", chunk,
                         Source(agent="rag", channel="docs"), 0.5)
            n.tags = ["doc", name.split(".")[0]]
            chunk_nodes.append(n)
        cx.store_batch(chunk_nodes)          # one device embed per doc
        # chain chunks so graph proximity pulls in surrounding context
        for a, b in zip(chunk_nodes, chunk_nodes[1:]):
            cx.create_edge(Edge.new(a.id, b.id, "related_to", 0.9,
                                    EdgeProvenance.manual("rag")))
        doc_ids[name] = [n.id for n in chunk_nodes]
    return doc_ids


def retrieve(cx: Cortex, question: str, k: int = 3) -> str:
    hits = cx.search_hybrid(question, limit=k)
    context = "\n---\n".join(r.node.body for r in hits)
    return context


def main():
    cx = Cortex.in_memory()
    ingest(cx)
    question = "what happens when a page is not acknowledged?"
    context = retrieve(cx, question)
    prompt = (f"Answer using only this context:\n{context}\n\n"
              f"Question: {question}")
    print(prompt)   # hand `prompt` to your LLM of choice
    cx.close()


if __name__ == "__main__":
    main()
