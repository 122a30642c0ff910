from .snapshot import load_snapshot, save_snapshot  # noqa: F401
from .compare import compare_snapshots, compare_states  # noqa: F401
from .fits import read_fits, write_fits  # noqa: F401
