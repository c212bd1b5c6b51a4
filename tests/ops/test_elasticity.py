"""Voigt conversion + derived moduli (own pymatgen-ElasticTensor analog)."""

import numpy as np

from matten_tpu.ops.elasticity import ElasticTensor, full_to_voigt, voigt_to_full


def _random_elastic_full(rng):
    """Random rank-4 tensor with the elasticity symmetries ijkl=jikl=klij."""
    c = rng.normal(size=(3, 3, 3, 3))
    c = c + c.transpose(1, 0, 2, 3)
    c = c + c.transpose(0, 1, 3, 2)
    c = c + c.transpose(2, 3, 0, 1)
    return c


def _isotropic_full(lam, mu):
    d = np.eye(3)
    return (
        lam * np.einsum("ij,kl->ijkl", d, d)
        + mu * (np.einsum("ik,jl->ijkl", d, d) + np.einsum("il,jk->ijkl", d, d))
    )


class TestVoigt:
    def test_round_trip(self):
        rng = np.random.default_rng(0)
        c = _random_elastic_full(rng)
        np.testing.assert_allclose(voigt_to_full(full_to_voigt(c)), c, atol=1e-12)

    def test_voigt_symmetric(self):
        rng = np.random.default_rng(1)
        v = full_to_voigt(_random_elastic_full(rng))
        np.testing.assert_allclose(v, v.T, atol=1e-12)

    def test_known_entries(self):
        c = np.zeros((3, 3, 3, 3))
        c[0, 1, 0, 1] = c[1, 0, 0, 1] = c[0, 1, 1, 0] = c[1, 0, 1, 0] = 7.0
        v = full_to_voigt(c)
        assert v[5, 5] == 7.0  # (0,1)(0,1) -> C66


class TestElasticTensor:
    def test_is_ndarray(self):
        rng = np.random.default_rng(2)
        et = ElasticTensor(_random_elastic_full(rng))
        assert isinstance(et, np.ndarray)
        assert et.shape == (3, 3, 3, 3)
        np.testing.assert_allclose(np.asarray(et), et)

    def test_isotropic_moduli_exact(self):
        # for an isotropic solid both Voigt and Reuss averages equal the
        # exact K = lambda + 2mu/3 and G = mu
        lam, mu = 80.0, 30.0
        et = ElasticTensor(_isotropic_full(lam, mu))
        k, g = lam + 2 * mu / 3, mu
        for val in (et.k_voigt, et.k_reuss, et.k_vrh):
            np.testing.assert_allclose(val, k, rtol=1e-10)
        for val in (et.g_voigt, et.g_reuss, et.g_vrh):
            np.testing.assert_allclose(val, g, rtol=1e-10)
        e = 9 * k * g / (3 * k + g)
        nu = (3 * k - 2 * g) / (2 * (3 * k + g))
        np.testing.assert_allclose(et.y_mod, e, rtol=1e-10)
        np.testing.assert_allclose(et.homogeneous_poisson, nu, rtol=1e-10)
        np.testing.assert_allclose(et.universal_anisotropy, 0.0, atol=1e-10)

    def test_from_voigt_round_trip(self):
        rng = np.random.default_rng(3)
        c = _random_elastic_full(rng)
        et = ElasticTensor.from_voigt(full_to_voigt(c))
        np.testing.assert_allclose(np.asarray(et), c, atol=1e-12)

    def test_directional_young_isotropic(self):
        # E(n) is direction-independent and equals E for an isotropic solid
        lam, mu = 80.0, 30.0
        et = ElasticTensor(_isotropic_full(lam, mu))
        rng = np.random.default_rng(5)
        for _ in range(5):
            n = rng.normal(size=3)
            np.testing.assert_allclose(
                et.directional_young_modulus(n), et.y_mod, rtol=1e-10
            )

    def test_linear_compressibility_isotropic(self):
        # beta(n) = 1/(3K) for an isotropic solid; integrates to 1/K volumetric
        lam, mu = 80.0, 30.0
        et = ElasticTensor(_isotropic_full(lam, mu))
        k = lam + 2 * mu / 3
        rng = np.random.default_rng(6)
        for _ in range(5):
            n = rng.normal(size=3)
            np.testing.assert_allclose(
                et.linear_compressibility(n), 1.0 / (3.0 * k), rtol=1e-10
            )

    def test_directional_young_cubic_extremes(self):
        # cubic crystal: E along <100> is 1/S11; along <111> it is
        # 1/(S11 - 2*(S11 - S12 - S44/2)/3) (standard textbook result)
        v = np.zeros((6, 6))
        c11, c12, c44 = 165.0, 64.0, 79.0  # silicon, GPa
        v[:3, :3] = c12
        np.fill_diagonal(v[:3, :3], c11)
        v[3, 3] = v[4, 4] = v[5, 5] = c44
        et = ElasticTensor.from_voigt(v)
        s = et.compliance_voigt
        e100 = 1.0 / s[0, 0]
        np.testing.assert_allclose(
            et.directional_young_modulus([1, 0, 0]), e100, rtol=1e-10
        )
        j = s[0, 0] - s[0, 1] - 0.5 * s[3, 3]
        e111 = 1.0 / (s[0, 0] - 2.0 * j / 3.0)
        np.testing.assert_allclose(
            et.directional_young_modulus([1, 1, 1]), e111, rtol=1e-10
        )

    def test_vrh_ordering(self):
        # Reuss <= Hill <= Voigt for a positive-definite stiffness
        rng = np.random.default_rng(4)
        c = _random_elastic_full(rng) + 60 * np.asarray(_isotropic_full(80.0, 30.0)) / 30
        et = ElasticTensor(c)
        assert et.k_reuss <= et.k_vrh + 1e-9 <= et.k_voigt + 2e-9
        assert et.g_reuss <= et.g_vrh + 1e-9 <= et.g_voigt + 2e-9
