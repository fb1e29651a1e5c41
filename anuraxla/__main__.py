"""``python -m anuraxla <command> [args...]`` dispatcher."""

import importlib
import sys

from anuraxla.cli import ALIASES, COMMANDS


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: python -m anuraxla <command> [args...]\n\ncommands:")
        for name in COMMANDS:
            print(f"  {name}")
        print("\naliases (reference script numbers):", ", ".join(ALIASES))
        raise SystemExit(0 if len(sys.argv) >= 2 else 1)

    cmd = sys.argv[1]
    cmd = ALIASES.get(cmd, cmd)
    if cmd not in COMMANDS:
        raise SystemExit(f"unknown command: {cmd!r} (try --help)")
    sys.argv = [f"anuraxla {cmd}"] + sys.argv[2:]
    mod = importlib.import_module(COMMANDS[cmd])
    mod.main()


if __name__ == "__main__":
    main()
