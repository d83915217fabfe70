"""classifier plugin: tag urgent-sounding memories at store time
(lands in node.metadata["classification"]).

cortex.toml:
    [[plugins]]
    path = "examples/plugins/priority_classifier.py"
    type = "classifier"
"""

URGENT = ("outage", "sev1", "deadline", "urgent", "asap", "breaking")


def classify(node):
    text = f"{node.title} {node.body}".lower()
    if any(w in text for w in URGENT):
        return "urgent"
    return None
