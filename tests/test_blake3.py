"""BLAKE3 golden tests: official vectors + structural properties."""

from zkvm.hash.blake3 import blake3, hash_elements, merge, merge_with_int


def test_official_vectors():
    # official BLAKE3 test vectors (32-byte output)
    assert (
        blake3(b"").hex()
        == "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
    )
    assert (
        blake3(b"abc").hex()
        == "6437b3ac38465133ffb63b75273a8db548c558465d79db03fd359c6cd5bd9d85"
    )


def test_block_and_chunk_boundaries():
    # all sizes hash without error and deterministically
    for n in [1, 63, 64, 65, 128, 1023, 1024, 1025, 2048, 2049, 4096]:
        data = bytes(i % 251 for i in range(n))
        assert blake3(data) == blake3(data)
        assert len(blake3(data)) == 32


def test_merge_is_hash_of_concat():
    d1, d2 = blake3(b"left"), blake3(b"right")
    assert merge(d1, d2) == blake3(d1 + d2)


def test_merge_with_int():
    d = blake3(b"seed")
    assert merge_with_int(d, 1) == blake3(d + (1).to_bytes(8, "little"))
    assert merge_with_int(d, 1) != merge_with_int(d, 2)


def test_hash_elements_le_bytes():
    assert hash_elements([1, 2]) == blake3(
        (1).to_bytes(16, "little") + (2).to_bytes(16, "little")
    )
