"""Personal assistant with persistent graph memory.

Parity: reference examples/personal-assistant/*.py — an agent loop
that stores what it learns, recalls before answering, and reads its
briefing at session start. Uses the Python SDK in embedded mode so it
runs with no server.

Run: python examples/personal-assistant/assistant.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..",
                                "sdks", "python"))

from cortex_memory import Cortex


def main():
    data = os.path.join(os.path.dirname(__file__), ".assistant-memory")
    with Cortex.open(data) as memory:
        # seed the agent's identity once
        if not memory.search("assistant agent profile", limit=1):
            memory.store("agent", "assistant",
                         "Personal assistant agent profile.",
                         agent="assistant", importance=0.9)

        # things the user tells us become memories
        memory.store("preference", "User prefers morning meetings",
                     "Schedule calls before noon whenever possible.",
                     agent="assistant", importance=0.7,
                     tags=["calendar"])
        memory.store("fact", "User's team runs standup at 9:30",
                     "Daily standup for the platform team is 9:30 am.",
                     agent="assistant", tags=["calendar"])
        memory.store("event", "Booked dentist for Thursday",
                     "Dentist appointment booked Thursday 3pm.",
                     agent="assistant", tags=["appointments"])

        # recall before answering a question
        question = "when should I schedule the sync call?"
        print(f"Q: {question}")
        for hit in memory.search(question, limit=3):
            print(f"   recalled ({hit.score:.2f}): {hit.node.title}")

        # session-start context
        print("\n--- briefing ---")
        print(memory.briefing("assistant"))


if __name__ == "__main__":
    main()
