"""briefing_section plugin: a "Pinned" section for nodes tagged
`pinned`, appearing in every agent's briefing.

cortex.toml:
    [[plugins]]
    path = "examples/plugins/pinned_section.py"
    type = "briefing_section"
"""


def make_section(cortex):
    def provider(agent_id):
        ids = [n.id for n in cortex.list_nodes() if "pinned" in n.tags]
        return ("Pinned", ids)
    return provider
