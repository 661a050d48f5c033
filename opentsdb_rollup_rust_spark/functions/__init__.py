from .timeutil import time_bucket, time_bucket_epoch  # noqa: F401
from .hashing import series_hash_bucket, md5_bucket  # noqa: F401
from .arrays import token_array_stats, token_invariant_violations  # noqa: F401
