"""``make_dataset`` — generate granules + fire CSV into the reference layout.

The reference's README and Makefile promise this module
(``README.md:29-33``, ``Makefile:32-33`` runs ``src/data/make_dataset.py``)
but ship an empty ``src/data/`` — plumekit supplies it. The implementation
is the CLI's ``make_dataset`` subcommand (:mod:`plumekit.cli`); this module
is the promised direct entry point::

    python -m plumekit.data.make_dataset --root data --n-granules 4
"""

from __future__ import annotations

import sys
from typing import Optional, Sequence


def main(argv: Optional[Sequence[str]] = None) -> int:
    from plumekit.cli import build_parser

    args = build_parser().parse_args(["make_dataset", *(argv if argv is not
                                                        None else sys.argv[1:])])
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
