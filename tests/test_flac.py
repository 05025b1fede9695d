"""Native FLAC decoder tests.

No FLAC encoder exists in this image, so these tests include a minimal
spec-conformant encoder (BitWriter + STREAMINFO + frame writer) covering
CONSTANT, VERBATIM, and FIXED(0-2)+Rice subframes, mono and stereo
(independent and left/side), and verify bit-exact round-trips through
wavjepa_tpu/data/_native/flac_decoder.cc.
"""

import numpy as np
import pytest


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int):
        self.bits.extend([0] * q)
        self.bits.append(1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for b in self.bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
        return bytes(out)


def write_streaminfo(w: BitWriter, sr: int, channels: int, bps: int, total: int):
    w.write(0x664C6143, 32)  # fLaC
    w.write(1, 1)  # last metadata block
    w.write(0, 7)  # STREAMINFO
    w.write(34, 24)
    w.write(4096, 16)  # min blocksize
    w.write(4096, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(sr, 20)
    w.write(channels - 1, 3)
    w.write(bps - 1, 5)
    w.write(total, 36)
    for _ in range(16):
        w.write(0, 8)  # md5


def write_frame_header(w: BitWriter, blocksize: int, ch_code: int, frame_no: int):
    w.write(0x3FFE, 14)
    w.write(0, 1)  # reserved
    w.write(0, 1)  # fixed blocksize stream
    w.write(7, 4)  # blocksize: 16-bit value follows
    w.write(0, 4)  # sample rate: from streaminfo
    w.write(ch_code, 4)
    w.write(4, 3)  # 16 bps
    w.write(0, 1)
    assert frame_no < 128
    w.write(frame_no, 8)  # utf8 single byte
    w.write(blocksize - 1, 16)
    w.write(0, 8)  # crc8 (decoder skips)


def write_verbatim(w: BitWriter, samples, bps: int):
    w.write(0, 1)
    w.write(1, 6)  # VERBATIM
    w.write(0, 1)  # no wasted bits
    for s in samples:
        w.write_signed(int(s), bps)


def write_constant(w: BitWriter, value: int, bps: int):
    w.write(0, 1)
    w.write(0, 6)  # CONSTANT
    w.write(0, 1)
    w.write_signed(value, bps)


def write_fixed_rice(w: BitWriter, samples, bps: int, order: int, k: int):
    w.write(0, 1)
    w.write(8 + order, 6)  # FIXED
    w.write(0, 1)
    samples = [int(s) for s in samples]
    for s in samples[:order]:
        w.write_signed(s, bps)
    # residuals
    res = []
    for i in range(order, len(samples)):
        if order == 0:
            pred = 0
        elif order == 1:
            pred = samples[i - 1]
        elif order == 2:
            pred = 2 * samples[i - 1] - samples[i - 2]
        else:
            raise ValueError
        res.append(samples[i] - pred)
    w.write(0, 2)  # rice method 0
    w.write(0, 4)  # partition order 0
    w.write(k, 4)  # rice parameter
    for r in res:
        u = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
        # zigzag: positive → 2r, negative → -2r-1
        u = (2 * r) if r >= 0 else (-2 * r - 1)
        w.write_unary(u >> k)
        w.write(u & ((1 << k) - 1), k)


def encode_flac(channel_writers, sr=16000, channels=1, bps=16, blocksize=256,
                ch_code=None, total=None):
    """channel_writers: list of frames; each frame is a list of
    (writer_fn) callables, one per channel."""
    w = BitWriter()
    n_frames = len(channel_writers)
    write_streaminfo(
        w, sr, channels, bps, total if total is not None else n_frames * blocksize
    )
    for fno, frame in enumerate(channel_writers):
        w.align()
        write_frame_header(
            w, blocksize, ch_code if ch_code is not None else channels - 1, fno
        )
        for write_subframe in frame:
            write_subframe(w)
        w.align()
        w.write(0, 16)  # crc16 (decoder skips)
    return w.bytes()


@pytest.fixture(scope="module")
def flac_native():
    from wavjepa_tpu.data._native import flac_native as mod

    return mod


class TestFlacDecoder:
    def test_verbatim_mono(self, flac_native):
        rng = np.random.default_rng(0)
        x = rng.integers(-32768, 32767, size=512, dtype=np.int64)
        frames = [
            [lambda w, s=x[:256]: write_verbatim(w, s, 16)],
            [lambda w, s=x[256:]: write_verbatim(w, s, 16)],
        ]
        data = encode_flac(frames, blocksize=256)
        wav, sr = flac_native.decode(data)
        assert sr == 16000 and wav.shape == (1, 512)
        np.testing.assert_allclose(wav[0], x / 32768.0, atol=1e-7)

    def test_constant(self, flac_native):
        data = encode_flac([[lambda w: write_constant(w, -1234, 16)]])
        wav, _ = flac_native.decode(data)
        np.testing.assert_allclose(wav[0], np.full(256, -1234 / 32768.0), atol=1e-7)

    @pytest.mark.parametrize("order", [0, 1, 2])
    @pytest.mark.parametrize("k", [0, 2, 6])
    def test_fixed_rice_roundtrip(self, flac_native, order, k):
        rng = np.random.default_rng(order * 10 + k)
        # smooth signal so low-order prediction residuals stay small
        t = np.arange(256)
        x = (1000 * np.sin(t / 17.0) + rng.integers(-20, 20, 256)).astype(np.int64)
        data = encode_flac([[lambda w: write_fixed_rice(w, x, 16, order, k)]])
        wav, _ = flac_native.decode(data)
        np.testing.assert_allclose(wav[0], x / 32768.0, atol=1e-7)

    def test_stereo_independent(self, flac_native):
        rng = np.random.default_rng(3)
        left = rng.integers(-1000, 1000, 256, dtype=np.int64)
        right = rng.integers(-1000, 1000, 256, dtype=np.int64)
        frames = [[
            lambda w: write_verbatim(w, left, 16),
            lambda w: write_verbatim(w, right, 16),
        ]]
        data = encode_flac(frames, channels=2, ch_code=1)
        wav, _ = flac_native.decode(data)
        assert wav.shape == (2, 256)
        np.testing.assert_allclose(wav[0], left / 32768.0, atol=1e-7)
        np.testing.assert_allclose(wav[1], right / 32768.0, atol=1e-7)

    def test_stereo_left_side(self, flac_native):
        rng = np.random.default_rng(4)
        left = rng.integers(-1000, 1000, 256, dtype=np.int64)
        right = rng.integers(-1000, 1000, 256, dtype=np.int64)
        side = left - right  # needs bps+1 = 17 bits
        frames = [[
            lambda w: write_verbatim(w, left, 16),
            lambda w: write_verbatim(w, side, 17),
        ]]
        data = encode_flac(frames, channels=2, ch_code=8)
        wav, _ = flac_native.decode(data)
        np.testing.assert_allclose(wav[0], left / 32768.0, atol=1e-7)
        np.testing.assert_allclose(wav[1], right / 32768.0, atol=1e-7)

    def test_decode_via_dispatch(self, flac_native):
        """decode_audio routes .flac payloads to the native decoder."""
        from wavjepa_tpu.data.decode import decode_audio

        x = np.arange(-128, 128, dtype=np.int64)
        data = encode_flac([[lambda w: write_verbatim(w, x, 16)]])
        wav, sr = decode_audio({"flac": data})
        assert sr == 16000
        np.testing.assert_allclose(wav[0], x / 32768.0, atol=1e-7)

    def test_garbage_rejected(self, flac_native):
        with pytest.raises(ValueError):
            flac_native.decode(b"not a flac stream at all")
