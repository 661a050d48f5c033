from .job import run_rollup_job, apply_retention  # noqa: F401
from .tier_router import read_rollup  # noqa: F401
