"""Pure-numpy kernels, bit-exact vs the matrixprofiler C++ goldens."""

from .mathfn import (
    binary_split,
    complexity,
    corr_ed,
    ed_corr,
    inner_product,
    mode,
    normalize,
    seqmean,
    seqsum,
    std,
    sum_of_squares,
    znorm,
)
from .mass import (
    mass,
    mass2,
    mass3,
    mass_absolute,
    mass_pre,
    mass_pre_abs,
    mass_pre_weighted,
    mass_weighted,
    set_k,
)
from .mp import contrast, mpx, mpxab, scrimp, scrimpab, stamp, stomp
from .window import (
    movmax,
    movmean,
    movmean_std,
    movmin,
    movstd,
    movsum,
    movsum_ogita,
    movvar,
    muinvn,
    zero_crossing,
)

__all__ = [
    "binary_split", "complexity", "corr_ed", "ed_corr", "inner_product",
    "mode", "normalize", "seqmean", "seqsum", "std", "sum_of_squares",
    "znorm", "mass", "mass2", "mass3", "mass_absolute", "mass_pre",
    "mass_pre_abs", "mass_pre_weighted", "mass_weighted", "set_k",
    "contrast", "mpx", "mpxab", "scrimp", "scrimpab", "stamp", "stomp", "movmax",
    "movmean", "movmean_std", "movmin", "movstd", "movsum", "movsum_ogita",
    "movvar", "muinvn", "zero_crossing",
]
