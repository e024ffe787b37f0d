from .sa import gsa_bwt  # noqa: F401
from .merge import merge_plain  # noqa: F401
