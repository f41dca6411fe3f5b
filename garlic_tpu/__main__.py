"""`python -m garlic_tpu` / `garlic-tpu` console entry point."""

from __future__ import annotations

import sys


def main() -> None:
    from .pipeline import run_main
    sys.exit(run_main(sys.argv[1:], prog=sys.argv[0]))


if __name__ == "__main__":
    main()
