"""``python -m pion_tpu {icgen,run} ...`` — the reference's binaries
(reference: bin_serial/Makefile:389-400 pion-ugs/icgen-ugs targets)."""
from .cli import main

if __name__ == "__main__":
    import sys

    sys.exit(main())
