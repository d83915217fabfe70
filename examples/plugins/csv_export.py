"""export_format plugin: `cortex export --format csv_export`.

cortex.toml:
    [[plugins]]
    path = "examples/plugins/csv_export.py"
    type = "export_format"
"""

import csv
import io


def export(nodes, edges):
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(["id", "kind", "title", "importance", "tags", "agent"])
    for n in nodes:
        w.writerow([n.id, n.kind, n.title, n.importance,
                    ";".join(n.tags), n.source.agent])
    return buf.getvalue()
