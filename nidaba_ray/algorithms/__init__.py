"""Pure computational kernels (no Ray) — analog of nidaba/algorithms/.

Unit-tested before being wired into stages (SURVEY.md §7 step 2).
"""

from nidaba_ray.algorithms.strings import (  # noqa: F401
    sanitize,
    edit_distance,
    full_edit_distance,
    lcs_align,
    align_vote,
    strings_by_deletion,
    sym_suggest,
)
from nidaba_ray.algorithms.median import approximate_median, improve_median  # noqa: F401
