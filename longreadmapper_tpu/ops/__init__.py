from .rank import pack_codes, occ_samples, occ, backward_step
from .vote import top2_votes, top2_small_histo
from .wavefront import banded_nw_scores

__all__ = [
    "pack_codes", "occ_samples", "occ", "backward_step",
    "top2_votes", "top2_small_histo",
    "banded_nw_scores",
]
