"""Shared team memory for multi-agent crews.

Parity: reference examples/crewai-team/*.py — several agents share one
graph memory; each gets its own briefing, and what one agent stores
the others can recall. Works with or without crewai installed.

Run: python examples/crewai-team/team_memory.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from cortex_tpu.api import Cortex
from cortex_tpu.types import Node, Source


def agent_store(cx, agent: str, kind: str, title: str, body: str,
                importance: float = 0.6):
    n = Node.new(kind, title, body, Source(agent=agent), importance)
    cx.store(n)
    return n.id


def main():
    cx = Cortex.in_memory()

    # register the crew
    for name, role in [("researcher", "Finds and verifies information"),
                       ("writer", "Drafts content from research"),
                       ("reviewer", "Checks drafts for accuracy")]:
        cx.store(Node.new("agent", name, f"{role}.", Source(agent=name),
                          0.9))

    # researcher learns things
    agent_store(cx, "researcher", "fact",
                "Competitor launched a vector database",
                "AcmeDB shipped a managed vector search product in June.")
    agent_store(cx, "researcher", "fact",
                "Market wants hybrid search",
                "Buyers ask for combined keyword+vector+graph retrieval.")

    # writer recalls the researcher's work — shared memory, no handoff
    print("writer recalls:")
    for score, n in cx.search("what did research find about the market",
                              limit=3):
        print(f"  {score:.2f}  {n.title}  (by {n.source.agent})")

    # each agent gets its own synthesized briefing
    print("\nreviewer briefing:")
    print(cx.briefing("reviewer", compact=True))

    cx.close()


if __name__ == "__main__":
    main()
