from .deterministic import (  # noqa: F401
    cents,
    money_avg,
    money_sum,
    ratio_e4,
    ratio_e4_signed,
    ratio_round,
)
from .texthash import salted_md5, shingles, simhash16, tokens  # noqa: F401
