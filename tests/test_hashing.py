import numpy as np

from dnscrawler_spark.hashing import mix2, mix2_np, splitmix64, splitmix64_np, str_hash64


def test_scalar_vs_vectorized_agree():
    xs = np.array([0, 1, 2, 12345, 2**63, 2**64 - 1], dtype=np.uint64)
    vec = splitmix64_np(xs)
    for x, v in zip(xs.tolist(), vec.tolist()):
        assert splitmix64(int(x)) == int(v)


def test_mix2_agree():
    a = np.array([3, 99, 2**40], dtype=np.uint64)
    vec = mix2_np(a, 0xABC)
    for x, v in zip(a.tolist(), vec.tolist()):
        assert mix2(int(x), 0xABC) == int(v)


def test_str_hash_deterministic_and_spread():
    h1 = str_hash64("http://a.example.com/x")
    assert h1 == str_hash64("http://a.example.com/x")
    assert h1 != str_hash64("http://a.example.com/y")
    assert str_hash64("a", seed=1) != str_hash64("a", seed=2)


def test_splitmix_known_vector():
    # reference value for splitmix64(0) from the public algorithm
    assert splitmix64(0) == 0xE220A8397B1DCDAF
