"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

Codec status (honest tiering):

- REAL decoders, numpy/stdlib only, no external libs: PPM P6/P5
  (``decode_ppm``), uncompressed 24-bit BMP (``decode_bmp``), PCM WAV
  via the stdlib ``wave`` module (``decode_wav``), GIF 87a/89a with a
  full variable-width LZW implementation (``decode_gif``), and PNG —
  whose only compression is DEFLATE, i.e. the stdlib ``zlib`` module —
  including all 5 scanline filters, Adam7 interlace, palettes, and
  sub-8-bit depths (``decode_png``); JPEG — baseline AND
  progressive, full Huffman + batched-IDCT pipeline
  (``operators/jpeg.py``); and WEBP-lossless — VP8L prefix codes,
  color cache, LZ77, palettes (``operators/vp8l.py``, r10; two spec
  corners raise documented typed errors — see its module doc). These
  are complete decoders, not stubs.
- STUBBED: the remaining transform codecs (MP3/H.264/lossy-WEBP)
  require ffmpeg-class libraries, absent from this environment.
  ``decode_image`` dispatches: supported magic bytes decode for real,
  the remaining compressed magics raise the clearly-marked
  NotImplementedError, and ``fake_image_features`` remains the
  deterministic stand-in for arbitrary bytes.

Scale notes: media bytes never pass through Python row-at-a-time —
mapInPandas streams Arrow record batches; ``media_repartition`` sizes
partitions by total byte budget (binary columns make row-count-based
partitioning useless: 10k rows can be 10 MB or 100 GB).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_ppm(content: bytes):
    """REAL decoder: binary PPM (P6, RGB) / PGM (P5, grayscale) ->
    numpy uint8 array of shape (H, W, 3) or (H, W). Handles the full
    netpbm header grammar (whitespace runs, ``#`` comments) and
    maxval<=255; 16-bit maxval raises (rare, and widening is a caller
    decision)."""
    import numpy as np

    if content[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM (P6/P5) payload")
    # header tokens: magic, width, height, maxval — separated by
    # whitespace, with '#...\n' comments allowed anywhere between
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(content) and content[i : i + 1].isspace():
            i += 1
        if content[i : i + 1] == b"#":
            while i < len(content) and content[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(content) and not content[j : j + 1].isspace():
            j += 1
        if j == i:  # ran off the end before 3 header tokens appeared
            raise ValueError("malformed netpbm header: truncated")
        tokens.append(content[i:j])
        i = j
    i += 1  # single whitespace after maxval, then raw pixel bytes
    if not all(t.isdigit() for t in tokens):
        raise ValueError(
            f"malformed netpbm header: non-numeric tokens {tokens!r}"
        )
    width, height, maxval = (int(t) for t in tokens)
    if width <= 0 or height <= 0 or maxval <= 0:
        raise ValueError(
            "malformed netpbm header: non-positive "
            f"width/height/maxval ({width}x{height}, maxval={maxval})"
        )
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    ch = 3 if content[:2] == b"P6" else 1
    need = width * height * ch
    if len(content) - i < need:
        raise ValueError("truncated PPM payload")
    pixels = np.frombuffer(content, dtype=np.uint8, count=need, offset=i)
    return pixels.reshape(
        (height, width, 3) if ch == 3 else (height, width)
    )


def decode_bmp(content: bytes):
    """REAL decoder: uncompressed 24-bit BMP (BI_RGB) -> numpy uint8
    (H, W, 3) in RGB order. Handles bottom-up row order and 4-byte row
    padding; other bit depths / compressions raise."""
    import struct

    import numpy as np

    if content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", content, 10)[0]
    width, height = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    rows = np.frombuffer(
        content, dtype=np.uint8, count=row_bytes * height, offset=data_off
    ).reshape(height, row_bytes)[:, : width * 3]
    img = rows.reshape(height, width, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if bottom_up else img


def _g711_luts():
    """256-entry decode LUTs for G.711 mu-law and A-law -> int16,
    built from the published piecewise-linear formulas (validated
    byte-for-byte against the stdlib ``audioop`` reference in
    tests/test_multimodal_codecs.py)."""
    import numpy as np

    mu = np.zeros(256, np.int16)
    al = np.zeros(256, np.int16)
    for i in range(256):
        b = ~i & 0xFF
        exp = (b >> 4) & 7
        val = (((b & 0x0F) << 3) + 0x84 << exp) - 0x84
        mu[i] = -val if b & 0x80 else val
        b = i ^ 0x55
        exp = (b >> 4) & 7
        mant = b & 0x0F
        val = (mant << 4) + 8 if exp == 0 else ((mant << 4) + 0x108) << (
            exp - 1
        )
        # A-law sign convention is inverted vs mu-law: bit 7 SET (after
        # the 0x55 toggle) marks the POSITIVE half
        al[i] = val if b & 0x80 else -val
    return mu, al


# IMA ADPCM step/index tables (public spec constants)
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_decode_nibbles(nibbles, pred: int, idx: int):
    """Serial IMA ADPCM core: one int16 sample per 4-bit code."""
    out = []
    for n in nibbles:
        step = _IMA_STEPS[idx]
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        pred = max(-32768, min(32767, pred - diff if n & 8 else pred + diff))
        idx = max(0, min(88, idx + _IMA_INDEX[n & 7]))
        out.append(pred)
    return out, pred, idx


def decode_wav(content: bytes):
    """REAL decoder: WAV container parsed directly (RIFF chunk walk)
    -> (numpy array of shape (frames, channels), sample_rate).

    Format coverage: PCM 8-bit (uint8) / 16-bit (int16), IEEE float32
    (float32), G.711 A-law/mu-law (decoded to int16 via exact LUTs),
    and IMA ADPCM format 0x11 (per-block headers, interleaved 4-byte
    channel groups, low-nibble-first). WAVE_FORMAT_EXTENSIBLE unwraps
    to its inner tag. Other compressions (MP3-in-WAV, GSM) raise the
    typed NotImplementedError."""
    import struct

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    try:
        return _decode_wav_body(content)
    except (IndexError, struct.error) as exc:
        # same loud-typed-failure contract as the image codecs: hostile
        # bytes must not surface as opaque low-level errors in the
        # Arrow path
        raise ValueError(f"truncated or corrupt WAV payload: {exc}")


def _decode_wav_body(content: bytes):
    import struct

    import numpy as np

    pos = 12
    fmt = None
    data = None
    fact_frames = None  # 'fact' chunk: true per-channel sample count
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        ln = struct.unpack_from("<I", content, pos + 4)[0]
        body = content[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and ln >= 4:
            fact_frames = struct.unpack_from("<I", body, 0)[0]
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    if len(fmt) < 16:
        raise ValueError("truncated WAV fmt chunk")
    tag, n_ch, rate, _br, block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if n_ch == 0:
        raise ValueError("WAV with zero channels")
    if tag == 0xFFFE and len(fmt) >= 26:  # EXTENSIBLE: real tag in GUID
        tag = struct.unpack_from("<H", fmt, 24)[0]
    if tag == 1:  # PCM
        dtype = {8: np.uint8, 16: np.int16}.get(bits)
        if dtype is None:
            raise NotImplementedError(f"{bits}-bit PCM WAV not supported")
        n = len(data) // (n_ch * (bits // 8)) * n_ch
        return np.frombuffer(data, dtype, n).reshape(-1, n_ch), rate
    if tag == 3:  # IEEE float
        if bits != 32:
            raise NotImplementedError(f"{bits}-bit float WAV not supported")
        n = len(data) // (4 * n_ch) * n_ch
        return np.frombuffer(data, np.float32, n).reshape(-1, n_ch), rate
    if tag in (6, 7):  # G.711 A-law / mu-law
        mu, al = _g711_luts()
        lut = mu if tag == 7 else al
        n = len(data) // n_ch * n_ch
        codes = np.frombuffer(data, np.uint8, n)
        return lut[codes].reshape(-1, n_ch), rate
    if tag == 0x11:  # IMA ADPCM
        # honor wSamplesPerBlock from the fmt extension when present —
        # without it the final block's zero-pad nibbles would decode
        # as trailing garbage samples
        spb = None
        if len(fmt) >= 20:
            cb = struct.unpack_from("<H", fmt, 16)[0]
            if cb >= 2:
                spb = struct.unpack_from("<H", fmt, 18)[0]
        arr, rate = _decode_ima_wav(data, n_ch, rate, block_align, spb)
        if fact_frames is not None:  # spec: fact states the true length
            arr = arr[:fact_frames]
        return arr, rate
    raise NotImplementedError(f"WAV format tag 0x{tag:02x} not supported")


def _decode_ima_wav(
    data: bytes,
    n_ch: int,
    rate: int,
    block_align: int,
    samples_per_block: int | None = None,
):
    """IMA ADPCM WAV: per-block 4-byte channel headers (int16
    predictor emitted as the first sample + step index), then
    interleaved 4-byte groups of 8 low-nibble-first codes per
    channel. Each block's output is trimmed to ``samples_per_block``
    (from the fmt extension, defaulting to the block-geometry value),
    and a truncated final block decodes as far as its data reaches."""
    import struct

    import numpy as np

    if block_align < 4 * n_ch:
        raise ValueError("IMA ADPCM block smaller than its headers")
    if samples_per_block is None:
        samples_per_block = (block_align - 4 * n_ch) * 2 // n_ch + 1
    if samples_per_block < 1:
        raise ValueError("corrupt IMA ADPCM samples-per-block")
    chans: list[list[int]] = [[] for _ in range(n_ch)]
    for boff in range(0, len(data), block_align):
        block = data[boff : boff + block_align]
        if len(block) < 4 * n_ch:
            break  # final partial block too short for its headers
        preds = []
        idxs = []
        block_out: list[list[int]] = [[] for _ in range(n_ch)]
        for c in range(n_ch):
            pred, idx, _rsv = struct.unpack_from("<hBB", block, 4 * c)
            if idx > 88:
                raise ValueError("corrupt IMA ADPCM step index")
            preds.append(pred)
            idxs.append(idx)
            block_out[c].append(pred)  # header predictor IS sample 0
        p = 4 * n_ch
        while p + 4 * n_ch <= len(block):
            for c in range(n_ch):
                nib = []
                for b in block[p + 4 * c : p + 4 * c + 4]:
                    nib.append(b & 0x0F)  # low nibble first
                    nib.append(b >> 4)
                out, preds[c], idxs[c] = _ima_decode_nibbles(
                    nib, preds[c], idxs[c]
                )
                block_out[c].extend(out)
            p += 4 * n_ch
        for c in range(n_ch):
            chans[c].extend(block_out[c][:samples_per_block])
    if not chans[0]:
        raise ValueError("IMA ADPCM WAV contains no complete block")
    n = min(len(c) for c in chans)
    arr = np.empty((n, n_ch), np.int16)
    for c in range(n_ch):
        arr[:, c] = chans[c][:n]
    return arr, rate


def decode_au(content: bytes):
    """REAL decoder: Sun/NeXT .au -> (numpy array (frames, channels),
    sample_rate). Big-endian header; encodings covered: G.711 mu-law
    (1, via the exact LUT), 8-bit signed PCM (2), 16-bit PCM (3), and
    G.711 A-law (27). Validated against the stdlib ``sunau`` +
    ``audioop`` reference chain on CPython's own test fixtures."""
    import struct

    import numpy as np

    if content[:4] != b".snd":
        raise ValueError("not an AU payload")
    try:
        off, size, enc, rate, n_ch = struct.unpack_from(">IIIII", content, 4)
        if n_ch == 0 or off < 24:
            raise ValueError("malformed AU header")
        # honor the declared data size (0xFFFFFFFF = unknown) — the
        # sunau reference bounds reads the same way; trailing
        # annotation bytes must not decode as audio
        data = (
            content[off:]
            if size == 0xFFFFFFFF
            else content[off : off + size]
        )
        if enc in (1, 27):  # G.711
            mu, al = _g711_luts()
            lut = mu if enc == 1 else al
            n = len(data) // n_ch * n_ch
            return lut[np.frombuffer(data, np.uint8, n)].reshape(-1, n_ch), rate
        if enc == 2:  # 8-bit signed linear
            n = len(data) // n_ch * n_ch
            return np.frombuffer(data, np.int8, n).reshape(-1, n_ch), rate
        if enc == 3:  # 16-bit BE linear
            n = len(data) // (2 * n_ch) * n_ch
            return np.frombuffer(data, ">i2", n).astype(np.int16).reshape(
                -1, n_ch
            ), rate
        raise NotImplementedError(f"AU encoding {enc} not supported")
    except struct.error as exc:
        raise ValueError(f"truncated or corrupt AU payload: {exc}")


def decode_aiff(content: bytes):
    """REAL decoder: AIFF (uncompressed PCM) -> (numpy int16/int8
    array (frames, channels), sample_rate). IFF chunk walk, COMM with
    the 80-bit extended-float sample rate decoded manually, SSND with
    offset/blocksize. AIFC compression types beyond NONE raise.
    Validated against the stdlib ``aifc`` reference on CPython's own
    test fixtures."""
    import struct

    import numpy as np

    if content[:4] != b"FORM" or content[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF payload")
    try:
        pos = 12
        comm = None
        ssnd = None
        while pos + 8 <= len(content):
            cid = content[pos : pos + 4]
            ln = struct.unpack_from(">I", content, pos + 4)[0]
            body = content[pos + 8 : pos + 8 + ln]
            pos += 8 + ln + (ln & 1)
            if cid == b"COMM":
                comm = body
            elif cid == b"SSND":
                ssnd = body
        if comm is None or ssnd is None:
            raise ValueError("AIFF missing COMM or SSND chunk")
        n_ch, frames, bits = struct.unpack_from(">hIh", comm, 0)
        if n_ch <= 0:
            raise ValueError("malformed AIFF COMM")
        # 80-bit IEEE extended float: 1 sign + 15 exp + 64 mantissa;
        # real rates are tiny exponents — anything larger is corrupt
        exp = struct.unpack_from(">H", comm, 8)[0]
        mant = struct.unpack_from(">Q", comm, 10)[0]
        if exp == 0 and mant == 0:
            rate = 0
        elif (exp & 0x7FFF) > 16383 + 62:
            raise ValueError("malformed AIFF sample rate exponent")
        else:
            rate = int(round(mant * 2.0 ** ((exp & 0x7FFF) - 16383 - 63)))
        if len(comm) >= 22 and comm[18:22] not in (b"NONE", b"sowt"):
            raise NotImplementedError(
                f"AIFC compression {comm[18:22]!r} not supported"
            )
        little = len(comm) >= 22 and comm[18:22] == b"sowt"
        data_off = struct.unpack_from(">I", ssnd, 0)[0]
        data = ssnd[8 + data_off :]
        if bits == 16:
            dt = "<i2" if little else ">i2"
            n = len(data) // (2 * n_ch) * n_ch
            arr = np.frombuffer(data, dt, n).astype(np.int16)
        elif bits == 8:
            n = len(data) // n_ch * n_ch
            arr = np.frombuffer(data, np.int8, n)
        else:
            raise NotImplementedError(f"{bits}-bit AIFF not supported")
        arr = arr.reshape(-1, n_ch)
        if frames:  # COMM numSampleFrames bounds the data, like aifc:
            arr = arr[:frames]  # SSND block padding is not audio
        return arr, rate
    except (struct.error, IndexError, OverflowError) as exc:
        raise ValueError(f"truncated or corrupt AIFF payload: {exc}")


def is_audio_payload(content: bytes) -> bool:
    """The single audio-container sniff shared by decode_audio,
    decode_image's guidance error, and extract_features' routing —
    one predicate, never three hand-synced copies."""
    return (
        (content[:4] == b"RIFF" and content[8:12] == b"WAVE")
        or content[:4] == b".snd"
        or (content[:4] == b"FORM" and content[8:12] in (b"AIFF", b"AIFC"))
        or content[:4] == b"fLaC"
    )


def decode_audio(content: bytes):
    """Dispatch by magic: WAV (RIFF/WAVE), Sun AU (.snd), AIFF/AIFC
    (FORM) and FLAC (real lossless decode, operators/flac.py)
    -> (numpy array (frames, channels), sample_rate)."""
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return decode_wav(content)
    if content[:4] == b".snd":
        return decode_au(content)
    if content[:4] == b"FORM" and content[8:12] in (b"AIFF", b"AIFC"):
        return decode_aiff(content)
    if content[:4] == b"fLaC":
        from data_governance_spark.operators.flac import decode_flac

        return decode_flac(content)
    raise ValueError("unrecognized audio payload")


def audio_features(content: bytes) -> list[float]:
    """REAL feature vector for decodable audio:
    [n_frames, channels, sample_rate, mean, mean, mean, std] — the
    same 7-wide shape as ``image_features`` so both flow through one
    Arrow schema (mean repeated where images carry per-plane means).
    Covers WAV, Sun AU, AIFF and FLAC via ``decode_audio``."""
    import numpy as np

    arr, rate = decode_audio(content)
    if arr.shape[0] == 0:
        raise ValueError("audio stream contains no samples")
    a = np.asarray(arr, dtype=np.float64)
    m = float(a.mean())
    return [
        float(arr.shape[0]), float(arr.shape[1]), float(rate), m, m, m,
        float(a.std()),
    ]


def _gif_lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW (LSB-first bit packing, CLEAR/END codes,
    code width grows 3..12 bits) -> pixel index list. Pure stdlib."""
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []
    # bit reader over the concatenated sub-block payload
    bitpos = 0
    nbits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return end  # truncated stream: treat as end-of-information
        byte = bitpos >> 3
        val = int.from_bytes(data[byte : byte + 3], "little")
        val = (val >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return val

    def reset():
        return (
            {i: (i,) for i in range(clear)},
            min_code_size + 1,
            None,
        )

    table, width, prev = reset()
    while True:
        code = read_code(width)
        if code == clear:
            table, width, prev = reset()
            continue
        if code == end:
            break
        if code in table:
            entry = table[code]
        elif code == len(table) + 2 and prev is not None:
            # the KwKwK case (code == next unassigned slot)
            entry = prev + (prev[0],)
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out.extend(entry)
        if prev is not None and len(table) + 2 < 4096:
            table[len(table) + 2] = prev + (entry[0],)
            # width timing (validated against real-world GIFs — the
            # IDLE icon set decodes bit-exact): after filling slot m
            # (post-insert next slot = len(table)+2 = m+1), widen when
            # the next slot saturates the current width. The encoder
            # mirror: it defines slot m one emission EARLIER than the
            # decoder learns m's content, and bumps after defining
            # slot 1<<width (definition is free; only wire codes are
            # width-limited, and that slot is only ever referenced
            # after the bump).
            if len(table) + 2 >= (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def decode_gif(content: bytes):
    """REAL decoder for a COMPRESSED format, pure stdlib+numpy: GIF
    (87a/89a) first frame -> numpy uint8 (H, W, 3). Handles global and
    local color tables, extension blocks, interlacing, and the full
    LZW variable-width code stream — no Pillow. Animated GIFs decode
    their first image descriptor (the corpus-pipeline contract:
    thumbnails/features, not playback)."""
    import struct

    if content[:4] != b"GIF8" or content[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF payload")
    try:
        return _decode_gif_body(content)
    except (IndexError, struct.error) as exc:
        # the codec tier's contract is TYPED loud failure — running
        # off the end of a truncated/hostile payload must not surface
        # as an opaque IndexError inside the Arrow path
        raise ValueError(f"truncated or corrupt GIF payload: {exc}")


def _decode_gif_body(content: bytes):
    import struct

    import numpy as np

    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        gct = np.frombuffer(content, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(content):
        block = content[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while content[pos] != 0:
                pos += 1 + content[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", content, pos + 1)
        pos += 10
        table = gct
        if ipacked & 0x80:
            n = 2 ** ((ipacked & 0x07) + 1)
            table = np.frombuffer(content, np.uint8, n * 3, pos).reshape(
                n, 3
            )
            pos += n * 3
        if table is None:
            raise ValueError("GIF image has no color table")
        mcs = content[pos]
        pos += 1
        chunks = []
        while content[pos] != 0:
            ln = content[pos]
            chunks.append(content[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        idx = _gif_lzw_decode(b"".join(chunks), mcs)
        if len(idx) < w * h:
            raise ValueError("truncated GIF pixel data")
        rows = np.asarray(idx[: w * h], dtype=np.int64).reshape(h, w)
        if ipacked & 0x40:  # interlaced: 4-pass row order
            order = (
                list(range(0, h, 8))
                + list(range(4, h, 8))
                + list(range(2, h, 4))
                + list(range(1, h, 2))
            )
            de = np.empty_like(rows)
            de[order] = rows
            rows = de
        return table[rows]  # palette lookup -> (H, W, 3)
    raise ValueError("GIF contains no image descriptor")


# PNG Adam7 interlace pass geometry: (x0, y0, dx, dy) per pass
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, off: int, ph: int, stride: int, bpp: int):
    """Undo PNG scanline filtering for one (sub-)image: `ph` scanlines
    of `stride` bytes, each prefixed by a filter-type byte, starting at
    `raw[off]`. Returns a (ph, stride) uint8 array. Filter types 0
    (None), 2 (Up) and 1 (Sub, via per-lane cumulative sum) are
    vectorized; 3 (Average) and 4 (Paeth) carry a genuine serial
    dependency on the just-reconstructed left neighbor, so they run
    per-byte — fine for the icon/thumbnail sizes the corpus tier
    decodes, and mapInPandas parallelism covers the rest."""
    import numpy as np

    recon = np.zeros((ph, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(ph):
        ft = raw[off]
        row = np.frombuffer(raw, np.uint8, stride, off + 1).astype(np.int32)
        off += 1 + stride
        if ft == 0:
            r = row
        elif ft == 2:  # Up
            r = (row + prev) & 0xFF
        elif ft == 1:  # Sub: cumulative sum along each bpp-strided lane
            pad = (-stride) % bpp
            lanes = np.concatenate([row, np.zeros(pad, np.int32)])
            lanes = lanes.reshape(-1, bpp).cumsum(axis=0) & 0xFF
            r = lanes.reshape(-1)[:stride]
        elif ft == 3:  # Average
            r = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = r[i - bpp] if i >= bpp else 0
                r[i] = (row[i] + ((a + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            r = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = int(r[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                r[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"corrupt PNG: unknown filter type {ft}")
        recon[y] = r
        prev = r
    return recon.astype(np.uint8)


def decode_png(content: bytes):
    """REAL decoder for a second COMPRESSED format, pure stdlib+numpy:
    PNG -> numpy uint8 of shape (H, W) for grayscale, (H, W, 2) for
    gray+alpha, (H, W, 3) for RGB/palette, (H, W, 4) for RGBA.

    PNG's only compression is DEFLATE — which the stdlib ``zlib``
    module IS — so no codec library is needed: chunk walk (with CRC32
    verification), inflate, per-scanline unfilter (all 5 filter
    types), Adam7 deinterlace, palette expansion, and sub-8-bit sample
    unpacking/scaling are all implemented here. 16-bit channels raise
    NotImplementedError (widening is a caller decision, mirroring the
    netpbm tier); a palette tRNS chunk is ignored (the corpus contract
    is thumbnails/features, not compositing)."""
    import struct
    import zlib

    import numpy as np

    if content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    try:
        pos = 8
        ihdr = None
        plte = None
        idat: list[bytes] = []
        while pos + 8 <= len(content):
            ln, typ = struct.unpack_from(">I4s", content, pos)
            data = content[pos + 8 : pos + 8 + ln]
            if len(data) < ln or pos + 12 + ln > len(content):
                raise ValueError("truncated PNG chunk")
            (crc,) = struct.unpack_from(">I", content, pos + 8 + ln)
            if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
                raise ValueError(f"PNG chunk CRC mismatch ({typ!r})")
            pos += 12 + ln
            if typ == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif typ == b"PLTE":
                plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
            elif typ == b"IDAT":
                idat.append(data)
            elif typ == b"IEND":
                break
        if ihdr is None or not idat:
            raise ValueError("PNG missing IHDR or IDAT")
        w, h, depth, ctype, comp, filt, interlace = ihdr
        if w == 0 or h == 0 or comp != 0 or filt != 0 or interlace > 1:
            raise ValueError("malformed PNG IHDR")
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
        if channels is None:
            raise ValueError(f"malformed PNG IHDR: color type {ctype}")
        if depth == 16:
            raise NotImplementedError("16-bit PNG not supported")
        if depth not in (1, 2, 4, 8) or (depth < 8 and ctype not in (0, 3)):
            raise ValueError(f"malformed PNG IHDR: bit depth {depth}")
        raw = zlib.decompress(b"".join(idat))

        out = np.zeros((h, w, channels), dtype=np.uint8)
        off = 0
        bpp = max(1, channels * depth // 8)
        for x0, y0, dx, dy in _ADAM7 if interlace else ((0, 0, 1, 1),):
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = (pw * channels * depth + 7) // 8
            if off + ph * (stride + 1) > len(raw):
                raise ValueError("truncated PNG pixel data")
            recon = _png_unfilter(raw, off, ph, stride, bpp)
            off += ph * (stride + 1)
            if depth == 8:
                sub = recon[:, : pw * channels].reshape(ph, pw, channels)
            else:  # MSB-first packed sub-byte samples (gray or palette)
                bits = np.unpackbits(recon, axis=1)[:, : pw * depth]
                weights = 1 << np.arange(depth - 1, -1, -1)
                sub = (bits.reshape(ph, pw, depth) * weights).sum(
                    axis=2, dtype=np.int32
                ).astype(np.uint8)[:, :, None]
            out[y0::dy, x0::dx] = sub
        if off != len(raw):
            raise ValueError("PNG pixel data length mismatch")
    except (IndexError, struct.error, zlib.error) as exc:
        # same loud-typed-failure contract as decode_gif: hostile bytes
        # must not surface as opaque low-level errors in the Arrow path
        raise ValueError(f"truncated or corrupt PNG payload: {exc}")

    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        idx = out[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        return plte[idx]  # (H, W, 3)
    if ctype == 0:
        gray = out[:, :, 0]
        if depth < 8:  # scale to 8-bit: 255/(2^d-1) is exact for 1/2/4
            gray = (gray.astype(np.int32) * (255 // ((1 << depth) - 1))).astype(
                np.uint8
            )
        return gray  # (H, W)
    return out  # (H, W, 2) gray+alpha or (H, W, 4) RGBA


def decode_image(content: bytes):
    """Dispatch by magic bytes: PPM/PGM, uncompressed BMP, GIF (real
    LZW decode), PNG (real DEFLATE decode via stdlib zlib), JPEG (real
    Huffman+IDCT decode, baseline AND progressive — operators/jpeg.py),
    MJPEG-in-AVI (first frame, the thumbnail contract), TIFF (real
    strip decode, none/LZW/PackBits/Deflate + predictor and the CCITT
    G4/MH fax tier, gray/RGB/RGBA/palette, both endians, both fill
    orders — operators/tiff.py; tiles/G3-with-EOL/JPEG-in-TIFF raise
    their documented typed errors) and
    WEBP-lossless (real VP8L decode — operators/vp8l.py; lossy VP8 and
    the 2D-distance/predictor spec corners raise their documented
    typed errors) all decode for REAL.

    WEBP caveat: libwebp's DEFAULT lossless output uses the predictor
    transform and 2D distance codes — both deliberately unimplemented
    here — so a typical real-world ``.webp`` raises the typed
    NotImplementedError rather than decoding; only streams encoded
    without spatial prediction (palette/cache/LZ77-1D) decode."""
    if content[:2] in (b"P6", b"P5"):
        return decode_ppm(content)
    if content[:2] == b"BM":
        return decode_bmp(content)
    if content[:4] == b"GIF8":
        return decode_gif(content)
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(content)
    if content[:3] == b"\xff\xd8\xff":
        from data_governance_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(content)
    if content[:4] == b"RIFF" and content[8:12] == b"AVI ":
        frames, _fps = decode_avi_mjpeg(content, max_frames=1)
        return frames[0]
    if content[:4] == b"RIFF" and content[8:12] == b"WEBP":
        from data_governance_spark.operators.vp8l import decode_vp8l

        return decode_vp8l(content)
    if content[:4] in (b"II*\x00", b"MM\x00*"):
        from data_governance_spark.operators.tiff import decode_tiff

        return decode_tiff(content)
    if is_audio_payload(content):
        raise ValueError(
            "payload is audio, not an image — use decode_audio / "
            "audio_features (extract_features routes it automatically)"
        )
    raise ValueError("unrecognized image payload")


def _img_stats(img) -> list[float]:
    """The shared 7-wide stats vector for a decoded pixel array."""
    import numpy as np

    h, w = img.shape[0], img.shape[1]
    c = 1 if img.ndim == 2 else img.shape[2]
    if c == 1:
        means = [float(img.mean())] * 3
    elif c == 2:
        means = [float(img[:, :, 0].mean())] * 3
    else:
        means = [float(img[:, :, k].mean()) for k in range(3)]
    return [
        float(w), float(h), float(c), *means,
        float(np.asarray(img, dtype=np.float64).std()),
    ]


def image_features(content: bytes) -> list[float]:
    """REAL feature vector for decodable images:
    [width, height, channels, mean_R, mean_G, mean_B, std_all] —
    deterministic, analytically stated by the q45 oracle for
    synthesized PPM bytes. Grayscale (and gray+alpha) repeat the
    single gray mean; RGBA reports RGB means (alpha excluded from
    means, included in std_all and the channel count)."""
    return _img_stats(decode_image(content))


def fake_image_features(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature extractor: a dim-wide folded
    byte histogram, normalized. Stable across runs/machines."""
    acc = [0] * dim
    for i, b in enumerate(content):
        acc[i % dim] += b
    total = float(sum(acc)) or 1.0
    return [a / total for a in acc]


def extract_features(
    media: DataFrame, dim: int = 8, decoder: str = "fake"
) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out.

    ``decoder="fake"`` uses the deterministic byte-histogram stand-in
    (works on ANY bytes); ``decoder="real"`` runs a genuine decode —
    ``image_features`` for image magics (PPM/PGM/BMP/GIF/PNG/JPEG/AVI
    first frame) and ``audio_features`` for audio containers
    (WAV incl. PCM/float/G.711/IMA-ADPCM, Sun AU, AIFF, FLAC) — while
    the remaining compressed formats raise, surfacing the environment
    constraint loudly rather than silently faking. Batch iteration,
    schema and null handling are the production shape either way.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"decoder must be 'fake' or 'real', got {decoder!r}")
    use_real = decoder == "real"

    def real_features(c: bytes) -> list[float]:
        if is_audio_payload(c):
            return audio_features(c)
        return image_features(c)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                None
                if c is None
                else (real_features(c) if use_real else fake_image_features(c, dim))
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def decode_avi_mjpeg(content: bytes, every_n: int = 1,
                     max_frames: int | None = None):
    """REAL video decoder for MJPEG-in-AVI, pure stdlib+numpy: walks
    the RIFF/AVI container (hdrl avih header, movi LIST, ``##dc``/
    ``##db`` video chunks of stream 0), decodes every ``every_n``-th
    frame with the pure-numpy JPEG decoder (operators/jpeg.py).
    Returns (frames, fps) where frames is a list of (H, W[, 3]) uint8
    arrays. Frames must carry their own DHT/DQT segments (our muxer
    and most MJPEG writers do; the legacy no-DHT MJPEG dialect
    surfaces the decoder's typed missing-table error). Non-MJPEG
    streams raise NotImplementedError at the first non-JPEG frame."""
    import struct

    from data_governance_spark.operators.jpeg import decode_jpeg

    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")

    usec_per_frame = 0
    payloads: list[bytes] = []

    def walk(start: int, end: int, depth: int = 0):
        nonlocal usec_per_frame
        if depth > 32:
            raise ValueError("AVI LIST nesting too deep")
        pos = start
        end = min(end, len(content))
        while pos + 8 <= end:
            cid = content[pos : pos + 4]
            ln = struct.unpack_from("<I", content, pos + 4)[0]
            body_start = pos + 8
            pos = body_start + ln + (ln & 1)  # word-aligned
            if cid == b"LIST":
                walk(body_start + 4, min(body_start + ln, end), depth + 1)
            elif cid == b"avih" and ln >= 4 and body_start + 4 <= end:
                usec_per_frame = struct.unpack_from(
                    "<I", content, body_start
                )[0]
            elif cid[:2] == b"00" and cid[2:4] in (b"dc", b"db") and ln:
                payloads.append(
                    content[body_start : min(body_start + ln, end)]
                )

    try:
        walk(12, len(content))
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated or corrupt AVI payload: {exc}")
    if not payloads:
        raise ValueError("AVI contains no stream-0 video frames")
    frames = []
    for i in range(0, len(payloads), every_n):
        if max_frames is not None and len(frames) >= max_frames:
            break
        p = payloads[i]
        if p[:3] != b"\xff\xd8\xff":
            raise NotImplementedError(
                "AVI video stream is not MJPEG (frame lacks JPEG SOI); "
                "other video codecs need ffmpeg-class libraries"
            )
        frames.append(decode_jpeg(p))
    fps = 1e6 / usec_per_frame if usec_per_frame else 0.0
    return frames, fps


FRAME_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def frame_features(
    media: DataFrame, every_n: int = 1, max_frames: int | None = None
) -> DataFrame:
    """REAL per-frame feature extraction for MJPEG-in-AVI video rows:
    mapInPandas decodes every ``every_n``-th frame and emits one row
    per frame with the same 7-wide image feature vector as
    ``image_features``. This is the real counterpart of
    ``sample_frames`` (which only plans timestamps from metadata)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, fpss, feats = [], [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                if c is None:
                    # null content keeps its row (null feature), same
                    # as extract_features — rows must never vanish
                    ids.append(mid)
                    idxs.append(None)
                    fpss.append(None)
                    feats.append(None)
                    continue
                frames, fps = decode_avi_mjpeg(c, every_n, max_frames)
                for j, img in enumerate(frames):
                    ids.append(mid)
                    idxs.append(j)
                    fpss.append(fps)
                    feats.append(_img_stats(img))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "fps": fpss,
                 "feature": feats}
            )

    return media.mapInPandas(run, FRAME_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: explodes planned frame
    timestamps from metadata (the decode of each frame is the stubbed
    step; the partition-parallel explode shape is the real one)."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.greatest(
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0).cast("long")) - 1,
                    F.lit(0).cast("long"),
                ),
                F.lit(every_ms).cast("long"),
            )
        ).alias("frame_ts_ms"),
    )
    return frames


def dedup_media_exact(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Exact media deduplication: byte-identical payloads (the
    dominant duplicate class in web crawls — re-hosted images, mirror
    copies) grouped by sha2-256 over the binary column. Returns
    (id, canonical_id, group_size) with canonical = min id per group.

    Scale shape: the hash is computed map-side AT THE SCAN and only
    (hash, id) ever shuffles — the binary payloads themselves never
    move (a 100 TB media corpus shuffles ~50 bytes/row). One shuffle
    (the window on the hash key). NULL payloads are each their own
    singleton group (a missing payload is unknown content, not a
    duplicate of other missing payloads — and rows must never
    vanish)."""
    from pyspark.sql import Window

    h = media.select(
        F.col(id_col),
        F.coalesce(
            F.sha2(F.col(content_col), 256),
            # per-row sentinel: impossible as a sha2 hex, unique per id
            F.concat(F.lit("null:"), F.col(id_col).cast("string")),
        ).alias("_h"),
    )
    w = Window.partitionBy("_h")
    return h.select(
        id_col,
        F.min(id_col).over(w).alias("canonical_id"),
        F.count(F.lit(1)).over(w).cast("long").alias("group_size"),
    )


def dedup_media_near(
    media: DataFrame,
    decoder: str = "fake",
    dim: int = 8,
    n_planes: int = 8,
    threshold: float = 0.98,
    seed: int = 42,
    max_block_size: int | None = None,
    features: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate media pairs: the standard embedding-dedup
    composition applied to decoded media features — extract (Arrow
    path) -> hyperplane LSH blocking -> exact within-block cosine
    (``similarity.cosine_neardup_pairs``). Catches re-encodes and
    minor edits that exact hashing misses; pair with
    ``dedup_media_exact`` for the full tiering. Feature width is
    ``dim`` for the fake decoder and 7 for the real one. Pass a
    precomputed ``features`` frame (extract_features output) to reuse
    an existing decode pass — the same reuse hook as
    ``similarity.semantic_dedup(pairs=)``."""
    from data_governance_spark.operators.similarity import (
        cosine_neardup_pairs,
        hyperplanes,
        lsh_bucket,
    )

    width = 7 if decoder == "real" else dim
    if features is None:
        features = extract_features(media, dim=dim, decoder=decoder)
    feats = (
        features
        .filter(F.col("feature").isNotNull())
        .select(
            "media_id",
            F.col("feature").cast("array<double>").alias("emb"),
        )
    )
    planes = hyperplanes(width, n_planes, seed)
    blocked = feats.withColumn("block", lsh_bucket(F.col("emb"), planes))
    return cosine_neardup_pairs(
        blocked,
        "block",
        threshold=threshold,
        id_col="media_id",
        vec_col="emb",
        max_block_size=max_block_size,
    )


def media_repartition(media: DataFrame, target_bytes: int = 128 << 20) -> DataFrame:
    """Partition by byte budget, not row count: estimates total size
    from a cheap aggregate and repartitions so each partition carries
    roughly target_bytes of media payload — floored at the runtime's
    defaultParallelism so a corpus smaller than one byte budget still
    decodes on every core instead of one (r14, guide §2.6: idle
    capacity; at scale the byte budget dominates and the floor is
    moot, while empty partitions on a tiny batch cost nothing)."""
    total = media.select(
        F.sum(F.coalesce(F.length("content"), F.lit(0))).alias("b")
    ).collect()[0]["b"] or 0
    floor = media.sparkSession.sparkContext.defaultParallelism
    n = max(1, floor, int(total / target_bytes) + 1)
    return media.repartition(n, "media_id")
