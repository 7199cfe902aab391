"""`python -m patchmatchnet_tpu <command>` — alias for the unified CLI."""

from patchmatchnet_tpu.cli import main

if __name__ == "__main__":
    main()
