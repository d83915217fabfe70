"""Interactive shell: a REPL that re-invokes the CLI argv per line.

Parity: cortex-server/src/cli/shell.rs:6-40 (rustyline REPL that
re-dispatches each line through the clap parser).
"""

from __future__ import annotations

import shlex
import sys


def run_shell(parent_args) -> int:
    from .main import CliContext, main

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
    # ONE context for the whole session: opening the engine per line
    # pays embedder init + index load + (under encryption-at-rest) a
    # whole-store decrypt/re-encrypt per keystroke-line
    ctx = CliContext(parent_args)
    try:
        return _loop(prefix, ctx, main)
    finally:
        ctx.close()


def _loop(prefix, ctx, main) -> int:
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
            main(argv, reuse_ctx=ctx)
        except SystemExit:
            pass        # argparse errors shouldn't kill the shell
        except KeyboardInterrupt:
            # ^C during a slow COMMAND returns to the prompt; ^C at
            # the prompt (handled above) exits the shell
            print("\n(interrupted)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — REPL must survive
            print(f"error: {e}", file=sys.stderr)
    return 0
