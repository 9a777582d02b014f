from .helpers import dec_avg, dec_sum, money
from .vector import cosine_sim, dot, l2_norm

__all__ = ["dec_avg", "dec_sum", "money", "cosine_sim", "dot", "l2_norm"]
