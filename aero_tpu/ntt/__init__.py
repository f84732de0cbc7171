from .ntt import ntt, intt, lde, lde_from_evals, Twiddles
