"""Host-side numpy Goldilocks arithmetic (NTT table builder) vs spec oracle."""

import numpy as np

from aero_tpu.ntt import gl_np
from aero_tpu.spec import field as F


RNG = np.random.default_rng(11)


class TestGlNp:
    def test_mul_random(self):
        a = RNG.integers(0, F.P, size=512, dtype=np.uint64)
        b = RNG.integers(0, F.P, size=512, dtype=np.uint64)
        got = gl_np.mul(a, b)
        for i in range(0, 512, 17):
            assert int(got[i]) == F.mul(int(a[i]), int(b[i]))

    def test_mul_edge_cases(self):
        edge = np.array([0, 1, F.P - 1, F.P - 2, 1 << 32, (1 << 32) - 1,
                         (1 << 63), F.P // 2], dtype=np.uint64)
        a = np.repeat(edge, len(edge))
        b = np.tile(edge, len(edge))
        got = gl_np.mul(a, b)
        for i in range(len(a)):
            assert int(got[i]) == F.mul(int(a[i]), int(b[i])), (a[i], b[i])

    def test_power_series(self):
        base = 1753635133440165772  # 2^32 root of unity
        got = gl_np.power_series(base, 64, scale=7)
        want = [F.mul(7, F.exp(base, i)) for i in range(64)]
        assert got.tolist() == want

    def test_ntt_pallas_tables_consistent(self):
        # table builder shares semantics with the device path; check the
        # cross-twiddle table against the spec for a small size
        from aero_tpu.ntt.ntt_pallas import _tables_np
        n = 1 << 13
        n1, n2, rev1, rev2, p1, p2, ctw = _tables_np(n, False)
        assert n1 * n2 == n
        w = F.get_root_of_unity(13)
        for k2 in (0, 1, 5, n2 - 1):
            for j1 in (0, 1, 7, n1 - 1):
                assert int(ctw[k2, j1]) == F.exp(w, j1 * k2)
        ni1, ni2, _, _, _, _, ctwi = _tables_np(n, True)
        wi = F.inv(w)
        inv_n = F.inv(n)
        assert int(ctwi[3, 4]) == F.mul(F.exp(wi, 12), inv_n)
