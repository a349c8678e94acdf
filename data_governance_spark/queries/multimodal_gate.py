"""q45 (quad-schema compound since r6): the multimodal column plumbing
AND the real uncompressed-format codec under the oracle gate.

Sub-gate 'hist' (ex-q45 shape): binary content synthesized
deterministically from `customer` (utf-8 bytes of 'blob<ck>') so the
DuckDB oracle recomputes the fake feature extractor's folded byte
histogram analytically — gating the Arrow path itself: BinaryType
columns through mapInPandas batches, byte-budget repartitioning, and
the frame-sampling explode.

Sub-gate 'real' (new in r6): a REAL image decode with no codec
library — each customer key becomes a 4x2 binary PPM (P6) built
byte-for-byte in Spark (constant planes r=ck%121, g=2ck%121,
b=3ck%121; values <128 so UTF-8 encode is byte-identity), decoded by
operators/multimodal.decode_ppm inside the decoder="real" mapInPandas
path; width/height/channels/per-plane means/std are stated
analytically by the oracle.

Sub-gates 'gif', 'png' and 'jpg' (all r7): fixed COMPRESSED payloads
— a real LZW-coded GIF, a real DEFLATE-coded interlaced palette PNG,
a real baseline JPEG (4:2:0, restart markers), and — sub-gate 'wav'
— a real G.711 mu-law compressed-audio payload — all decoded by the
pure-stdlib/numpy codecs through the same Arrow path (the JPEG tier
also decodes progressive/SOF2, and the WAV tier also covers A-law,
IMA ADPCM and IEEE float, exercised in tests against the stdlib
audioop reference). The 'wav' melt reuses the 7-wide metric labels;
for audio they read [frames, channels, rate, mean x3, std].

Sub-gate 'vid' (r7): a fixed MJPEG-in-AVI payload through
frame_features — real VIDEO frame decode (RIFF/AVI container walk +
per-frame JPEG decode), one oracle row per (frame, metric), frames
planted on the quantization grid so they reconstruct exactly. Only
MP3/H.264/WEBP-class transform codecs remain the documented
environment-constraint stub.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_governance_spark.queries.base import QueryDef, melt_metrics, qdef
from data_governance_spark.tables import table

QUERIES: dict[str, QueryDef] = {}

_DIM = 8  # histogram bins; oracle mirrors via range(b+1, len+1, 8)

# 'gif' sub-gate (new in r7): a fixed 4x2 4-color GIF89a byte literal
# (palette (255,0,0)/(0,255,0)/(0,0,255)/(10,20,30), pixel index rows
# [0,1,2,3]/[3,2,1,0], real LZW stream) decoded by the pure-stdlib
# decode_gif inside the decoder="real" Arrow path; the oracle states
# the analytically-known features as constants (the same
# planted-constant style as e05's 'lsh' rows). The byte string was
# produced by the spec encoder in tests/test_multimodal_codecs.py —
# the decoder is ALSO validated against real-world GIFs (the stdlib
# IDLE icon set decodes bit-exact, incl. interlaced files).
_GIF_HEX = (
    "47494638396104000200810000ff000000ff000000ff0a141e"
    "2c00000000040002000002054434230105003b"
)
# (w, h, c, mean_r, mean_g, mean_b) exact in float32; std rounded @4
_GIF_CONSTS = (4.0, 2.0, 3.0, 66.25, 68.75, 71.25)
_GIF_SD = 107.9183

# 'png' sub-gate (new in r7): a fixed 6x4 4-color PALETTE png at bit
# depth 2, Adam7-INTERLACED, rows filtered with a 0/1/2 mix — one
# 106-byte payload exercising chunk CRC walk, zlib inflate, three
# filter types, 7-pass deinterlace, sub-byte sample unpacking and
# palette expansion. Pixel pattern (r+c)%4 over palette
# (200,10,60)/(40,80,120)/(0,255,34)/(90,90,90): each color appears
# exactly 6 times, so the means are exact in float32. Bytes produced
# by the spec encoder in tests/test_multimodal_codecs.py; the decoder
# is ALSO validated against OS-shipped PNGs from independent encoders
# (python3-doc + gitweb icons).
_PNG_HEX = (
    "89504e470d0a1a0a0000000d4948445200000006000000040203000001a76d9646"
    "0000000c504c5445c80a3c28507800ff225a5a5a2a37e810000000194944415478"
    "9c6360008206860e8612c63b0c39098cc77e01001caf04e7cd40385e0000000049"
    "454e44ae426082"
)
_PNG_CONSTS = (6.0, 4.0, 3.0, 82.5, 108.75, 76.0)
_PNG_SD = 71.5023

# 'jpg' sub-gate (new in r7): a fixed 310-byte BASELINE JPEG — 16x16
# smooth gradient, 4:2:0 chroma subsampling, restart markers every
# MCU — decoded by the pure-numpy baseline decoder
# (operators/jpeg.py: canonical DHT Huffman, entropy unstuffing +
# RST segmentation, dequant, batched IDCT, chroma upsample,
# YCbCr->RGB). Means are k/256 dyadics, exact in float32; bytes from
# the spec encoder in tests/test_jpeg_codec.py, and the decoder is
# ALSO validated against Spark's own mllib photo fixtures.
_JPG_HEX = (
    "ffd8ffdb00430003030303030304040404040404040404040404040404040404"
    "0404040505050505050505050505050505050505050505050606060606060606"
    "06060606070707ffdb0043010404040404040606060606060606060606060606"
    "0606060606060606070707070707070707070707070707070707070707090909"
    "0909090909090909090a0a0affc00011080010001003012200021101031101ff"
    "c4001500000200000000000000000000000000000405ffc40015010002000000"
    "00000000000000000000000506ffc40018100000050000000000000000000000"
    "00000001020311ffc4001d110000000a00000000000000000000000000010203"
    "040512132131ffdd00040001ffda000c03010002110311003f005097c1ad3e11"
    "254720d69460aa4a210c8e00eab3539976380a41ffd9"
)
_JPG_CONSTS = (16.0, 16.0, 3.0, 155.95703125, 96.27734375, 137.41015625)
_JPG_SD = 29.3629

# 'wav' sub-gate (new in r7): a fixed 172-byte G.711 mu-law WAV
# (compressed telephony audio, stereo framing) decoded by the exact
# 256-entry LUT tier in decode_wav — the audio_features vector is
# [frames, channels, rate, mean x3, std], mean 2312/64 exact in
# float32. The LUT is validated byte-for-byte against the stdlib
# audioop reference; bytes from tests/test_multimodal_codecs.py's
# wav_container + audioop.lin2ulaw.
_WAV_HEX = (
    "52494646a400000057415645666d74201000000007000200803e0000007d0000"
    "020008006461746180000000ffbdaea7a09d9b9a9a9a9c9ea2a9b2c557382c25"
    "1f1d1b1a1a1b1c1f242b364fc9b4aaa39e9c9a9a9a9b9d9fa6adbbe63f2f2821"
    "1d1b1a1a1a1b1e21283041e0bbada69f9d9b9a9a9a9c9ea3aab4cb4e362b241f"
    "1c1b1a1a1b1d1f252c395ac4b1a9a29e9c9a9a9a9b9da0a7afbe723d2e26201d"
    "1b1a1a1a1c1e22293247d4b8"
)
_WAV_CONSTS = (64.0, 2.0, 16000.0, 36.125, 36.125, 36.125)
_WAV_SD = 7708.3828

# 'webp' sub-gate (new in r10): a fixed 182-byte WEBP-LOSSLESS (VP8L)
# payload — 8x4 pixels through the COLOR_INDEXING transform: a 4-entry
# delta-coded palette subimage, 2-bit pixel bundling (4 px/byte), and
# canonical prefix codes — decoded by the pure-numpy decode_vp8l
# (operators/vp8l.py). Pixel pattern (r+c)%4 over palette
# (128,0,64)/(32,96,160)/(0,255,17)/(80,80,80): each color appears
# exactly 8 times, so the means are k/4 — exact in float32. Bytes
# produced by the spec encoder in tests/test_vp8l.py (same recipe as
# gif/png/jpg).
_WEBP_HEX = (
    "52494646ae000000574542505650384ca10000002f07c000001f208020020000"
    "0000000000000004000200000000000000010000000000000000000000000000"
    "0410040000000000000000004000000000004000000040000000000000004000"
    "000080008200000000000000000c0000000800100000000000000000000000000"
    "00000000098ff40577e02082008000000000000000100200000000000000000"
    "04000000000000000000080000000000808888072d00"
)
_WEBP_CONSTS = (8.0, 4.0, 3.0, 60.0, 107.75, 80.25)
_WEBP_SD = 70.0171

# 'tif' sub-gate (new in r12): a fixed 235-byte BIG-ENDIAN TIFF — the
# (r+c)%4 pattern over palette (128,0,64)/(32,96,160)/(0,255,17)/
# (80,80,80) (same recipe as 'webp': each color appears 8 times so the
# means are k/4, exact in float32), stored as LZW-compressed RGB under
# the horizontal-differencing predictor in TWO strips — one payload
# exercising the MM byte order, IFD walk, strip table, TIFF-LZW (the
# shared PDF coder at EarlyChange=1) and the predictor cumsum
# (operators/tiff.py). Bytes from the spec writer in
# tests/test_tiff_codec.py.
_TIF_HEX = (
    "4d4d002a0000006d80200004050180c0e04f9c4a0511f8c160f082c1e130b1f880c0"
    "a08442a190e8841a33148e404080001fe11281447e30583c14060303813e7182c1e1"
    "30b301422d08854321d1083462291b80800008000800080000000000080000002f00"
    "00002700000026000a01000004000000010000000801010004000000010000000401"
    "02000300000003000000550103000300000001000500000106000300000001000200"
    "0001110004000000020000005d011500030000000100030000011600040000000100"
    "000002011700040000000200000065013d0003000000010002000000000000"
)
_TIF_CONSTS = (8.0, 4.0, 3.0, 60.0, 107.75, 80.25)
_TIF_SD = 70.0171

# 'fax' sub-gate (new in r12): a fixed 140-byte big-endian TIFF whose
# single strip is CCITT GROUP 4 (T.6 MMR) — an 8x4 checkerboard, so
# mean and std are both exactly 127.5 (dyadic, float32-exact). Drives
# operators/ccitt.py (mode codes, run tables, reference-line tracking)
# through the driver gate; bytes from the G4 spec encoder in
# tests/test_ccitt.py via the TIFF writer in tests/test_tiff_codec.py.
_FAX_HEX = (
    "4d4d002a0000001a26a88e88e82569249524924ad249280080080009010000040000"
    "00010000000801010004000000010000000401020003000000010001000001030003"
    "00000001000400000106000300000001000000000111000400000001000000080115"
    "00030000000100010000011600040000000100000004011700040000000100000012"
    "00000000"
)
_FAX_CONSTS = (8.0, 4.0, 1.0, 127.5, 127.5, 127.5)
_FAX_SD = 127.5

# 'vid' sub-gate (new in r7): a fixed 404-byte MJPEG-in-AVI video —
# two 12x8 solid-gray JPEG frames whose DC values sit on the
# quantization grid, so each frame reconstructs EXACTLY (mean = the
# planted gray, std = 0). frame_features walks the RIFF/AVI container
# and decodes each frame through the same pure-numpy JPEG decoder;
# one oracle row per (frame, metric). Bytes from the muxer in
# tests/test_jpeg_codec.py.
_VID_HEX = (
    "524946468c010000415649204c495354440000006864726c6176696838000000"
    "50c3000000000000000000001000000002000000000000000100000000000000"
    "0000000000000000000000000000000000000000000000004c49535434010000"
    "6d6f7669303064638f000000ffd8ffdb00430003040404040404040404050505"
    "0505050505050505060606060606060606060606060606060606060606060707"
    "07070707070707070708080808080808080809ffc0000b080008000c01011100"
    "ffc4001500000200000000000000000000000000000005ffc400141001000000"
    "00000000000000000000000000ffda0008010100003f00601fffd90030306463"
    "8f000000ffd8ffdb004300030404040404040404040505050505050505050505"
    "0606060606060606060606060606060606060606060607070707070707070707"
    "0708080808080808080809ffc0000b080008000c01011100ffc4001500000200"
    "000000000000000000000000000005ffc4001410010000000000000000000000"
    "0000000000ffda0008010100003f004e1fffd900"
)
_VID_FRAMES = ((0, 134.0), (1, 119.0))  # (frame_idx, exact gray mean)
_VID_FPS = 20.0

# 'au' sub-gate (new in r7): a fixed 120-byte Sun AU payload — G.711
# mu-law, 96 samples alternating one code and its sign flip, so the
# decoded values are exactly +/-2620: mean exactly 0.0, std exactly
# 2620.0, all trivially float32-exact. Decoded by decode_au via the
# decode_audio magic dispatch inside the same decoder="real" Arrow
# path; the AU decoder is ALSO validated against CPython's own
# audiotest.au through the stdlib sunau reference chain.
_AU_HEX = (
    "2e736e6400000018000000600000000100001f4c000000013aba3aba3aba3aba"
    "3aba3aba3aba3aba3aba3aba3aba3aba3aba3aba3aba3aba3aba3aba3aba3aba"
    "3aba3aba3aba3aba3aba3aba3aba3aba3aba3aba3aba3aba3aba3aba3aba3aba"
    "3aba3aba3aba3aba3aba3aba3aba3aba3aba3aba3aba3aba"
)
_AU_CONSTS = (96.0, 1.0, 8012.0, 0.0, 0.0, 0.0)
_AU_SD = 2620.0

# 'flc' sub-gate (new in r7): a fixed 58-byte FLAC payload — REAL
# lossless compressed audio (operators/flac.py: STREAMINFO, frame
# header with verified CRC-8, two CONSTANT subframes, CRC-16 footer).
# Stereo constants +/-3000: mean exactly 0.0, std exactly 3000.0 —
# nothing to round. Bytes from the spec encoder in
# tests/test_flac_codec.py, whose round-trips are bit-EXACT (lossless)
# across all subframe types, Rice partitions and stereo modes.
_FLC_HEX = (
    "664c61438000002200600060000000000000056222f000000060000000000000"
    "00000000000000000000fff8701000005f57000bb800f4489185"
)
_FLC_CONSTS = (96.0, 2.0, 22050.0, 0.0, 0.0, 0.0)
_FLC_SD = 3000.0

# 'pdfi' sub-gate (new in r12): PDF embedded-image extraction
# (operators/pdf.py pdf_images/extract_pdf_images) — one fixed 1,298-
# byte PDF carrying TWO image XObjects: the SAME 310-byte baseline
# JPEG as the 'jpg' sub-gate embedded via /Filter /DCTDecode (routes
# to operators/jpeg.py; features must equal the bare-JPEG constants),
# and a 3x2 constant-77 DeviceGray Flate raster (mean exactly 77,
# std exactly 0). Bytes regenerated + pinned by
# tests/test_pdf.py::test_gate_pdf_images_payload_pin.
_PDFI_HEX = (
    "255044462d312e350a25e2e3cfd30a312030206f626a0a3c3c202f54797065202f43"
    "6174616c6f67202f5061676573203220302052203e3e0a656e646f626a0a32203020"
    "6f626a0a3c3c202f54797065202f5061676573202f4b696473205b33203020525d20"
    "2f436f756e742031203e3e0a656e646f626a0a332030206f626a0a3c3c202f547970"
    "65202f50616765202f506172656e74203220302052202f5265736f7572636573203c"
    "3c202f466f6e74203c3c202f4631203520302052203e3e202f584f626a656374203c"
    "3c202f496d41203620302052202f496d42203720302052203e3e203e3e202f436f6e"
    "74656e7473203420302052203e3e0a656e646f626a0a342030206f626a0a3c3c2020"
    "2f4c656e677468203432203e3e0a73747265616d0a4254202f463120313220546620"
    "373220373230205464202848656c6c6f20576f726c642920546a2045540a656e6473"
    "747265616d0a656e646f626a0a352030206f626a0a3c3c202f54797065202f466f6e"
    "74202f53756274797065202f5479706531202f42617365466f6e74202f48656c7665"
    "74696361203e3e0a656e646f626a0a362030206f626a0a3c3c202f54797065202f58"
    "4f626a656374202f53756274797065202f496d616765202f5769647468203136202f"
    "486569676874203136202f436f6c6f725370616365202f446576696365524742202f"
    "42697473506572436f6d706f6e656e742038202f46696c746572202f444354446563"
    "6f6465202f4c656e67746820333130203e3e0a73747265616d0affd8ffdb00430003"
    "03030303030404040404040404040404040404040404040404040405050505050505"
    "0505050505050505050505050505060606060606060606060606070707ffdb004301"
    "04040404040406060606060606060606060606060606060606060606070707070707"
    "0707070707070707070707070707070909090909090909090909090a0a0affc00011"
    "080010001003012200021101031101ffc40015000002000000000000000000000000"
    "00000405ffc4001501000200000000000000000000000000000506ffc40018100000"
    "05000000000000000000000000000001020311ffc4001d110000000a000000000000"
    "00000000000000010203040512132131ffdd00040001ffda000c0301000211031100"
    "3f005097c1ad3e11254720d69460aa4a210c8e00eab3539976380a41ffd90a656e64"
    "73747265616d0a656e646f626a0a372030206f626a0a3c3c202f54797065202f584f"
    "626a656374202f53756274797065202f496d616765202f57696474682033202f4865"
    "696768742032202f436f6c6f725370616365202f44657669636547726179202f4269"
    "7473506572436f6d706f6e656e742038202f46696c746572202f466c617465446563"
    "6f6465202f4c656e677468203131203e3e0a73747265616d0a789cf3f50501000657"
    "01cf0a656e6473747265616d0a656e646f626a0a787265660a3020380a3030303030"
    "30303030302036353533352066200a30303030303030303135203030303030206e20"
    "0a30303030303030303634203030303030206e200a30303030303030313231203030"
    "303030206e200a30303030303030323630203030303030206e200a30303030303030"
    "333533203030303030206e200a30303030303030343233203030303030206e200a30"
    "303030303030383938203030303030206e200a747261696c65720a3c3c202f53697a"
    "652038202f526f6f74203120302052203e3e0a7374617274787265660a313037340a"
    "2525454f460a"
)
_PDFI_IMGS = (
    (0, _JPG_CONSTS, _JPG_SD),  # the DCT XObject == the bare 'jpg' payload
    (1, (3.0, 2.0, 1.0, 77.0, 77.0, 77.0), 0.0),  # constant gray raster
)

# 'mdd' sub-gate (new in r7): exact media dedup over payloads
# synthesized with PLANTED DUPLICATES — content 'blob<ck % _MDD_CLASSES>'
# makes the duplicate classes analytic, so the oracle restates the
# sha2-grouping's OUTPUT SEMANTICS (canonical = min key per class,
# group size = class count) without needing the hash itself. A real
# oracle over the live customer table, not embedded constants.
_MDD_CLASSES = 40


def _s(c: Column) -> Column:
    return c.cast("string")


@qdef(
    QUERIES,
    "q45_multimodal_features",
    oracle=f"""
    WITH f AS (
      SELECT c_custkey AS ck, 'blob' || CAST(c_custkey AS VARCHAR) AS s
      FROM customer
    ),
    h AS (
      SELECT ck, s, length(s) AS n,
        CAST(list_sum(list_transform(range(1, length(s) + 1),
                                     i -> ascii(substr(s, i, 1)))) AS DOUBLE) AS total
      FROM f
    ),
    rgb AS (
      SELECT ck, CAST(ck % 121 AS DOUBLE) AS r,
             CAST((ck * 2) % 121 AS DOUBLE) AS g,
             CAST((ck * 3) % 121 AS DOUBLE) AS b
      FROM f
    ),
    mddg AS (
      SELECT ck, canon, n
      FROM (SELECT c_custkey AS ck, c_custkey % {_MDD_CLASSES} AS g
            FROM customer)
      JOIN (SELECT c_custkey % {_MDD_CLASSES} AS g,
                   min(c_custkey) AS canon, count(*) AS n
            FROM customer GROUP BY g) USING (g)
    )
    SELECT 'hist' AS gate, CAST(ck AS VARCHAR) || ':nb' AS k,
           CAST(NULL AS VARCHAR) AS v_s, CAST(n AS DOUBLE) AS v_d FROM h
    {"".join(
      " UNION ALL SELECT 'hist', CAST(ck AS VARCHAR) || ':f" + str(b)
      + "', CAST(NULL AS VARCHAR), "
      + "round(CAST(CAST(COALESCE(list_sum(list_transform("
      + f"range({b} + 1, n + 1, {_DIM}), i -> ascii(substr(s, i, 1)))), 0)"
      + " / total AS FLOAT) AS DOUBLE), 4) + 0.0 FROM h"
      for b in range(4)
    )}
    UNION ALL
    SELECT 'hist', CAST(ck AS VARCHAR) || ':fr', CAST(NULL AS VARCHAR),
           CAST(CASE WHEN ck % 3 = 0 THEN ck % 5 + 1 END AS DOUBLE) FROM h
    UNION ALL
    SELECT 'real', CAST(ck AS VARCHAR) || ':w', CAST(NULL AS VARCHAR), 4.0 FROM rgb
    UNION ALL
    SELECT 'real', CAST(ck AS VARCHAR) || ':h', CAST(NULL AS VARCHAR), 2.0 FROM rgb
    UNION ALL
    SELECT 'real', CAST(ck AS VARCHAR) || ':c', CAST(NULL AS VARCHAR), 3.0 FROM rgb
    UNION ALL
    SELECT 'real', CAST(ck AS VARCHAR) || ':mr', CAST(NULL AS VARCHAR), r FROM rgb
    UNION ALL
    SELECT 'real', CAST(ck AS VARCHAR) || ':mg', CAST(NULL AS VARCHAR), g FROM rgb
    UNION ALL
    SELECT 'real', CAST(ck AS VARCHAR) || ':mb', CAST(NULL AS VARCHAR), b FROM rgb
    UNION ALL
    SELECT 'real', CAST(ck AS VARCHAR) || ':sd', CAST(NULL AS VARCHAR),
           round(CAST(CAST(sqrt((r*r + g*g + b*b) / 3
                      - ((r + g + b) / 3) * ((r + g + b) / 3)) AS FLOAT)
                 AS DOUBLE), 4) + 0.0
    FROM rgb
    {"".join(
      f" UNION ALL SELECT 'gif', 'g:{n}', CAST(NULL AS VARCHAR), {v}"
      for n, v in zip(("w", "h", "c", "mr", "mg", "mb"), _GIF_CONSTS)
    )}
    UNION ALL
    SELECT 'gif', 'g:sd', CAST(NULL AS VARCHAR), {_GIF_SD}
    {"".join(
      f" UNION ALL SELECT 'png', 'p:{n}', CAST(NULL AS VARCHAR), {v}"
      for n, v in zip(("w", "h", "c", "mr", "mg", "mb"), _PNG_CONSTS)
    )}
    UNION ALL
    SELECT 'png', 'p:sd', CAST(NULL AS VARCHAR), {_PNG_SD}
    {"".join(
      f" UNION ALL SELECT 'jpg', 'j:{n}', CAST(NULL AS VARCHAR), {v}"
      for n, v in zip(("w", "h", "c", "mr", "mg", "mb"), _JPG_CONSTS)
    )}
    UNION ALL
    SELECT 'jpg', 'j:sd', CAST(NULL AS VARCHAR), {_JPG_SD}
    {"".join(
      f" UNION ALL SELECT 'wav', 'a:{n}', CAST(NULL AS VARCHAR), {v}"
      for n, v in zip(("w", "h", "c", "mr", "mg", "mb"), _WAV_CONSTS)
    )}
    UNION ALL
    SELECT 'wav', 'a:sd', CAST(NULL AS VARCHAR), {_WAV_SD}
    {"".join(
      f" UNION ALL SELECT 'au', 'u:{n}', CAST(NULL AS VARCHAR), {v}"
      for n, v in zip(("w", "h", "c", "mr", "mg", "mb"), _AU_CONSTS)
    )}
    UNION ALL
    SELECT 'au', 'u:sd', CAST(NULL AS VARCHAR), {_AU_SD}
    {"".join(
      f" UNION ALL SELECT 'flc', 'f:{n}', CAST(NULL AS VARCHAR), {v}"
      for n, v in zip(("w", "h", "c", "mr", "mg", "mb"), _FLC_CONSTS)
    )}
    UNION ALL
    SELECT 'flc', 'f:sd', CAST(NULL AS VARCHAR), {_FLC_SD}
    {"".join(
      f" UNION ALL SELECT 'webp', 'x:{n}', CAST(NULL AS VARCHAR), {v}"
      for n, v in zip(("w", "h", "c", "mr", "mg", "mb"), _WEBP_CONSTS)
    )}
    UNION ALL
    SELECT 'webp', 'x:sd', CAST(NULL AS VARCHAR), {_WEBP_SD}
    {"".join(
      f" UNION ALL SELECT 'tif', 't:{n}', CAST(NULL AS VARCHAR), {v}"
      for n, v in zip(("w", "h", "c", "mr", "mg", "mb"), _TIF_CONSTS)
    )}
    UNION ALL
    SELECT 'tif', 't:sd', CAST(NULL AS VARCHAR), {_TIF_SD}
    {"".join(
      f" UNION ALL SELECT 'fax', 'y:{n}', CAST(NULL AS VARCHAR), {v}"
      for n, v in zip(("w", "h", "c", "mr", "mg", "mb"), _FAX_CONSTS)
    )}
    UNION ALL
    SELECT 'fax', 'y:sd', CAST(NULL AS VARCHAR), {_FAX_SD}
    {"".join(
      f" UNION ALL SELECT 'vid', 'v:{fi}:{n}', CAST(NULL AS VARCHAR), {v}"
      for fi, mean in _VID_FRAMES
      for n, v in (("w", 12.0), ("h", 8.0), ("c", 1.0), ("m", mean),
                   ("sd", 0.0), ("fps", _VID_FPS))
    )}
    {"".join(
      f" UNION ALL SELECT 'pdfi', 'i:{idx}:{n}', CAST(NULL AS VARCHAR), {v}"
      for idx, consts, sd in _PDFI_IMGS
      for n, v in (*zip(("w", "h", "c", "mr", "mg", "mb"), consts),
                   ("sd", sd))
    )}
    UNION ALL
    SELECT 'mdd', CAST(ck AS VARCHAR) || ':c', CAST(NULL AS VARCHAR),
           CAST(canon AS DOUBLE)
    FROM mddg
    UNION ALL
    SELECT 'mdd', CAST(ck AS VARCHAR) || ':n', CAST(NULL AS VARCHAR),
           CAST(n AS DOUBLE)
    FROM mddg
    """,
    doc="merged gate (r6/r7): multimodal plumbing — BinaryType through "
    "Arrow mapInPandas (fake codec histogram), byte-budget repartition, "
    "frame-sample plan (sub-gate 'hist') + REAL PPM decode via the "
    "numpy-only codec (decoder='real' path: dims/means/std of "
    "Spark-synthesized P6 bytes; sub-gate 'real', new in r6) + REAL "
    "GIF (LZW), PNG (zlib-DEFLATE, Adam7-interlaced depth-2 palette), "
    "baseline JPEG (Huffman+IDCT, 4:2:0, restart markers), G.711 "
    "mu-law audio (WAV and Sun-AU containers), lossless FLAC and "
    "MJPEG-in-AVI video-frame decodes of fixed compressed payloads "
    "via the pure-stdlib/numpy decoders (sub-gates "
    "'gif'/'png'/'jpg'/'wav'/'au'/'flc'/'vid', new in r7) + REAL "
    "WEBP-lossless: a VP8L payload through the delta-coded-palette "
    "COLOR_INDEXING transform with 2-bit pixel bundling "
    "(operators/vp8l.py; sub-gate 'webp', new in r10) + REAL TIFF: a "
    "big-endian LZW+predictor-2 two-strip RGB payload through the IFD "
    "walk (operators/tiff.py; sub-gate 'tif', new in r12) + REAL CCITT "
    "G4 fax: a checkerboard MMR strip in a TIFF container "
    "(operators/ccitt.py; sub-gate 'fax', new in r12) + exact media "
    "dedup over planted duplicate classes (sha2 grouping, sub-gate "
    "'mdd', new in r7) + PDF embedded-image extraction: a planted PDF "
    "whose DCT XObject must reproduce the bare-JPEG constants and "
    "whose Flate gray raster its planted constants, through "
    "extract_pdf_images' per-image explode (operators/pdf.py; "
    "sub-gate 'pdfi', new in r12)",
)
def q45_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.operators.multimodal import (
        extract_features,
        media_repartition,
        sample_frames,
    )

    # single-row-group input: fan out so sample_frames and the real
    # PPM-decode Arrow path run on every core (per-row maps,
    # partitioning-invariant; the feats path re-keys through
    # media_repartition either way)
    cust = table(spark, sf_dir, "customer").repartition(
        spark.sparkContext.defaultParallelism
    )
    k = F.col("c_custkey")
    media = cust.select(
        k.alias("media_id"),
        F.when(k % 3 == 0, F.lit("video")).otherwise(F.lit("image")).alias("kind"),
        F.encode(F.concat(F.lit("blob"), _s(k)), "UTF-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            # duration ck%5*1000+500 -> ck%5+1 sampled frames at 1s steps
            ((k % 5) * 1000 + 500).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )
    feats = extract_features(media_repartition(media), dim=_DIM)
    n_frames = (
        sample_frames(media)
        .groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n_frames"))
    )
    wide = feats.join(n_frames, "media_id", "left").select(
        "media_id",
        F.col("n_bytes").cast("double").alias("nb"),
        *[
            (
                F.round(F.get(F.col("feature"), b).cast("double"), 4)
                + F.lit(0.0)
            ).alias(f"f{b}")
            for b in range(4)
        ],
        F.col("n_frames").cast("double").alias("fr"),
    )
    hist = melt_metrics(
        wide,
        F.col("media_id").cast("string"),
        ("nb", "f0", "f1", "f2", "f3", "fr"),
        "hist",
    )

    # 'real' sub-gate: 4x2 P6 PPM built byte-for-byte in Spark
    # (values < 128, so UTF-8 encode is byte-identity), decoded by the
    # REAL numpy codec inside the decoder="real" Arrow path
    r, g, b = k % 121, (k * 2) % 121, (k * 3) % 121
    pix = F.repeat(F.concat(F.char(r), F.char(g), F.char(b)), 8)
    ppm = cust.select(
        k.alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(
            F.concat(F.lit("P6\n4 2\n255\n"), pix), "UTF-8"
        ).alias("content"),
        F.lit(None)
        .cast(
            "struct<mime:string,width:int,height:int,"
            "duration_ms:bigint,sample_rate:int>"
        )
        .alias("meta"),
    )
    rf = extract_features(ppm, decoder="real").select(
        "media_id",
        *[
            F.get(F.col("feature"), i).cast("double").alias(n)
            for i, n in enumerate(("w", "h", "c", "mr", "mg", "mb"))
        ],
        (
            F.round(F.get(F.col("feature"), 6).cast("double"), 4)
            + F.lit(0.0)
        ).alias("sd"),
    )
    real = melt_metrics(
        rf,
        F.col("media_id").cast("string"),
        ("w", "h", "c", "mr", "mg", "mb", "sd"),
        "real",
    )
    # 'gif' + 'png' sub-gates: both fixed compressed payloads through
    # ONE decoder="real" Arrow pass (decode_gif/decode_png via magic
    # dispatch); the gate label derives from the payload's magic
    # literal media_ids keyed to (fmt, tag) driver-side: no join, and
    # no reliance on monotonically_increasing_id re-evaluating
    # identically across two plan branches
    codec_payloads = [
        (0, "gif", "g", _GIF_HEX),
        (1, "png", "p", _PNG_HEX),
        (2, "jpg", "j", _JPG_HEX),
        (3, "wav", "a", _WAV_HEX),
        (4, "au", "u", _AU_HEX),
        (5, "flc", "f", _FLC_HEX),
        (6, "webp", "x", _WEBP_HEX),
        (7, "tif", "t", _TIF_HEX),
        (8, "fax", "y", _FAX_HEX),
    ]
    media_c = spark.createDataFrame(
        [
            (mid, "audio" if fmt in ("wav", "au", "flc") else "image",
             bytearray(bytes.fromhex(hexs)), None)
            for mid, fmt, _tag, hexs in codec_payloads
        ],
        "media_id long, kind string, content binary, "
        "meta struct<mime:string,width:int,height:int,"
        "duration_ms:bigint,sample_rate:int>",
    )
    fmt_map = F.element_at(
        F.array(*[F.lit(f) for _m, f, _t, _h in codec_payloads]),
        (F.col("media_id") + 1).cast("int"),
    )
    tag_map = F.element_at(
        F.array(*[F.lit(t) for _m, _f, t, _h in codec_payloads]),
        (F.col("media_id") + 1).cast("int"),
    )
    cf = extract_features(media_c, decoder="real").select(
        fmt_map.alias("fmt"),
        tag_map.alias("media_id"),
        *[
            F.get(F.col("feature"), i).cast("double").alias(n)
            for i, n in enumerate(("w", "h", "c", "mr", "mg", "mb"))
        ],
        (
            F.round(F.get(F.col("feature"), 6).cast("double"), 4)
            + F.lit(0.0)
        ).alias("sd"),
    )
    codec_rows = melt_metrics(
        cf,
        F.col("media_id"),
        ("w", "h", "c", "mr", "mg", "mb", "sd"),
        F.col("fmt"),
    )
    # 'vid' sub-gate: MJPEG-in-AVI through frame_features — one row
    # per (frame, metric), frames decoded by the same JPEG codec
    from data_governance_spark.operators.multimodal import frame_features

    vid = spark.createDataFrame(
        [(1, "video", bytearray(bytes.fromhex(_VID_HEX)), None)],
        "media_id long, kind string, content binary, "
        "meta struct<mime:string,width:int,height:int,"
        "duration_ms:bigint,sample_rate:int>",
    )
    vf = frame_features(vid).select(
        F.concat(F.lit("v:"), F.col("frame_idx").cast("string")).alias(
            "vkey"
        ),
        *[
            F.get(F.col("feature"), i).cast("double").alias(n)
            for i, n in ((0, "w"), (1, "h"), (2, "c"), (3, "m"))
        ],
        (
            F.round(F.get(F.col("feature"), 6).cast("double"), 4)
            + F.lit(0.0)
        ).alias("sd"),
        F.col("fps"),
    )
    vid_rows = melt_metrics(
        vf, F.col("vkey"), ("w", "h", "c", "m", "sd", "fps"), "vid"
    )
    # 'mdd' sub-gate: exact media dedup with planted duplicate classes
    from data_governance_spark.operators.multimodal import dedup_media_exact

    dup_media = cust.select(
        k.alias("media_id"),
        F.encode(
            F.concat(F.lit("blob"), _s(k % _MDD_CLASSES)), "UTF-8"
        ).alias("content"),
    )
    mdd = dedup_media_exact(dup_media).select(
        F.col("media_id").cast("string").alias("mk"),
        F.col("canonical_id").cast("double").alias("c"),
        F.col("group_size").cast("double").alias("n"),
    )
    mdd_rows = melt_metrics(mdd, F.col("mk"), ("c", "n"), "mdd")
    # 'pdfi' sub-gate (r12): embedded images pulled OUT of a PDF — the
    # DCT XObject must reproduce the bare-JPEG constants through
    # extract_pdf_images' mapInPandas explode, the Flate gray raster
    # its planted constants
    from data_governance_spark.operators.pdf import extract_pdf_images

    pdf_doc = spark.createDataFrame(
        [(1, bytearray(bytes.fromhex(_PDFI_HEX)))],
        "doc_id long, content binary",
    )
    pf = extract_pdf_images(pdf_doc).select(
        F.concat(F.lit("i:"), F.col("img_idx").cast("string")).alias("ik"),
        *[
            F.get(F.col("feature"), i).cast("double").alias(n)
            for i, n in enumerate(("w", "h", "c", "mr", "mg", "mb"))
        ],
        (
            F.round(F.get(F.col("feature"), 6).cast("double"), 4)
            + F.lit(0.0)
        ).alias("sd"),
    )
    pdfi_rows = melt_metrics(
        pf, F.col("ik"), ("w", "h", "c", "mr", "mg", "mb", "sd"), "pdfi"
    )
    return (
        hist.unionByName(real)
        .unionByName(codec_rows)
        .unionByName(vid_rows)
        .unionByName(mdd_rows)
        .unionByName(pdfi_rows)
    )
