"""Interactive shell: a REPL that re-invokes the CLI argv per line.

Parity: cortex-server/src/cli/shell.rs:6-40 (rustyline REPL that
re-dispatches each line through the clap parser).
"""

from __future__ import annotations

import shlex
import sys


def run_shell(parent_args) -> int:
    from .main import main

    try:
        import readline  # noqa: F401  (history + line editing)
    except ImportError:
        pass

    prefix = []
    if parent_args.config:
        prefix += ["--config", parent_args.config]
    if parent_args.data_dir:
        prefix += ["--data-dir", parent_args.data_dir]
    if parent_args.server:
        prefix += ["--server", parent_args.server]

    print("cortex shell — type a command ('node list', 'search ...'), "
          "'help', or 'exit'")
    while True:
        try:
            line = input("cortex> ").strip()
        except (EOFError, KeyboardInterrupt):
            print()
            return 0
        if not line:
            continue
        if line in ("exit", "quit"):
            return 0
        if line == "help":
            try:
                main(["--help"])
            except SystemExit:
                pass
            continue
        try:
            argv = prefix + shlex.split(line)
        except ValueError as e:
            print(f"parse error: {e}", file=sys.stderr)
            continue
        try:
            main(argv)
        except SystemExit:
            pass        # argparse errors shouldn't kill the shell
        except Exception as e:  # noqa: BLE001 — REPL must survive
            print(f"error: {e}", file=sys.stderr)
    return 0
