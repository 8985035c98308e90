"""``python -m go_datax_ray job.json`` — the reference's ``datax
job.json`` invocation shape (/root/reference/main.go:23-67 parses the
job path plus -p variables). Delegates to engine.main, which owns the
Ray session for the process."""

import sys

from .engine import main

if __name__ == "__main__":
    sys.exit(main())
