"""ingest plugin: poll a directory of .jsonl files for events (the
serve loop polls the adapter every [ingest.file] interval).

cortex.toml:
    [[plugins]]
    path = "examples/plugins/jsonl_dir_ingest.py"
    type = "ingest"
"""

import json
import os

from cortex_tpu.ingest import IngestAdapter, IngestEvent

WATCH = os.environ.get("JSONL_INGEST_DIR", "./events")


class JsonlDirAdapter(IngestAdapter):
    name = "jsonl-dir"

    def poll(self):
        events = []
        if not os.path.isdir(WATCH):
            return events
        for fname in sorted(os.listdir(WATCH)):
            if not fname.endswith(".jsonl"):
                continue
            path = os.path.join(WATCH, fname)
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        events.append(IngestEvent.from_json(
                            json.loads(line)))
                    except (ValueError, TypeError):
                        continue
            os.rename(path, path + ".done")
        return events


def make_adapter():
    return JsonlDirAdapter()
