from .deterministic import cents, money_avg, money_sum  # noqa: F401
from .texthash import salted_md5, shingles, simhash16, tokens  # noqa: F401
