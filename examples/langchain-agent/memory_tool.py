"""LangChain tool wrappers over cortex memory.

Parity: reference examples/langchain-agent/*.py. The tools work with
any LangChain agent; when langchain isn't installed the module still
exposes the plain functions for direct use.

Run: python examples/langchain-agent/memory_tool.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..",
                                "sdks", "python"))

from cortex_memory import Cortex

_memory = None


def get_memory() -> Cortex:
    global _memory
    if _memory is None:
        _memory = Cortex.open(os.path.join(os.path.dirname(__file__),
                                           ".agent-memory"))
    return _memory


def remember(text: str) -> str:
    """Store a fact the agent learned."""
    nid = get_memory().store("fact", text[:200], text, agent="langchain")
    return f"stored {nid}"


def recall(query: str) -> str:
    """Recall relevant memories for a query."""
    hits = get_memory().search(query, limit=5)
    if not hits:
        return "no relevant memories"
    return "\n".join(f"- {h.node.title}" for h in hits)


def make_langchain_tools():
    """Returns LangChain Tool objects when langchain is available."""
    try:
        from langchain.tools import Tool
    except ImportError:
        return None
    return [
        Tool(name="remember", func=remember,
             description="Store a fact in long-term memory."),
        Tool(name="recall", func=recall,
             description="Retrieve relevant facts from long-term memory."),
    ]


if __name__ == "__main__":
    print(remember("The staging cluster lives in europe-west4."))
    print(recall("where is staging?"))
    tools = make_langchain_tools()
    print("langchain tools:", "available" if tools else
          "not installed (plain functions still work)")
