from .jax_gl import (
    GF, P, to_gf, from_gf, gf_zeros, gf_full,
    add, sub, neg, mul, square, mul_scalar, mul_pow2_const, pow_const, inv, batch_inv,
    canonicalize, gf_where, gf_concat, gf_reshape, gf_take,
    power_series, gf_sum, eval_polys_at, eval_polys_multi, pow_loop,
    gf_cumprod, gf_cumsum,
)
