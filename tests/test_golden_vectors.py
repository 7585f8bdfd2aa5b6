"""Golden byte vectors hand-assembled from the PUBLIC specs.

Every other media test round-trips the repo's own synthesizers, which
leaves a shared-misreading risk: if builder and parser embed the same
wrong reading of a spec field, the roundtrip still passes.  The
vectors here are assembled DIRECTLY from the published wire layouts
-- RFC 9639 (FLAC), RFC 3533 (Ogg), the Matroska/EBML element tables
(RFC 8794), ISO 14496-12 box structure, H.264 7.3.2.1.1, and the AV1
spec 5.5 -- using only struct.pack, literal bytes, and an inline
bit-packer written independently of the package's _BitWriter.  The
repo's PARSERS must recover the stated field values exactly.
"""

from __future__ import annotations

import struct

from commoncrawl_crawler_spark.operators import mediameta as M
from commoncrawl_crawler_spark.operators import videobits as V


class _Pack:
    """Independent MSB-first bit packer (NOT the package's
    _BitWriter): golden vectors must not share code with the parsers
    under test."""

    def __init__(self):
        self.s = ""

    def u(self, v: int, n: int) -> None:
        self.s += format(v, "0{}b".format(n))

    def ue(self, v: int) -> None:  # Exp-Golomb (H.264 9.1)
        code = format(v + 1, "b")
        self.s += "0" * (len(code) - 1) + code

    def bytes_aligned(self, stop_bit: bool = False) -> bytes:
        s = self.s + ("1" if stop_bit else "")
        s += "0" * (-len(s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def test_flac_streaminfo_golden():
    """RFC 9639 streaminfo layout: 44.1 kHz stereo 16-bit, exactly
    1,000,000 samples, in a single last-metadata block."""
    packed = (44100 << 44) | ((2 - 1) << 41) | ((16 - 1) << 36) | 1000000
    streaminfo = (
        struct.pack(">HH", 4096, 4096)  # min/max blocksize
        + b"\x00\x00\x00" * 2  # min/max framesize unknown
        + packed.to_bytes(8, "big")
        + bytes(range(16))  # audio MD5
    )
    blob = b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") \
        + streaminfo
    d = M.parse_flac_streaminfo(blob)
    assert d["sample_rate"] == 44100
    assert d["channels"] == 2
    assert d["bits_per_sample"] == 16
    assert d["total_samples"] == 1000000
    assert d["audio_md5"] == bytes(range(16)).hex()
    assert d["n_blocks"] == 1 and d["block_types"] == [0]


def test_ogg_page_golden():
    """RFC 3533 section 6 page layout, one BOS page carrying a Vorbis
    identification header (Vorbis I spec 4.2.2)."""
    vorbis_id = (
        b"\x01vorbis"
        + struct.pack("<I", 0)  # vorbis_version
        + bytes([2])  # audio_channels
        + struct.pack("<I", 44100)  # audio_sample_rate
        + struct.pack("<iii", 0, 128000, 0)  # bitrates max/nominal/min
        + bytes([0x68])  # blocksize_0=8, blocksize_1=... (4+4 bits)
        + bytes([0x01])  # framing flag
    )
    assert len(vorbis_id) == 30
    page = (
        b"OggS"  # capture_pattern
        + bytes([0])  # stream_structure_version
        + bytes([0x02])  # header_type: BOS
        + struct.pack("<q", 0)  # granule_position
        + struct.pack("<I", 0x12345678)  # bitstream serial
        + struct.pack("<I", 0)  # page_sequence_number
        + struct.pack("<I", 0)  # CRC (not validated by the walk)
        + bytes([1])  # page_segments
        + bytes([30])  # segment table
        + vorbis_id
    )
    pages = M.parse_ogg_pages(page)
    assert len(pages) == 1
    p = pages[0]
    assert p["serial"] == 0x12345678
    assert p["seqno"] == 0
    assert p["header_type"] == 0x02
    assert p["granule"] == 0
    ident = M.parse_id_header(p["payload"])
    assert ident == {"codec": "vorbis", "channels": 2, "rate": 44100}


def test_ogg_opus_head_golden():
    """OpusHead layout (RFC 7845 section 5.1)."""
    head = (
        b"OpusHead"
        + bytes([1])  # version
        + bytes([2])  # channel count
        + struct.pack("<H", 312)  # pre-skip
        + struct.pack("<I", 48000)  # input sample rate
        + struct.pack("<h", 0)  # output gain
        + bytes([0])  # channel mapping family
    )
    ident = M.parse_id_header(head)
    assert ident == {
        "codec": "opus", "channels": 2, "rate": 48000, "preskip": 312,
    }


def _ebml(eid: int, payload: bytes) -> bytes:
    """One EBML element with a 1-byte (0x80|len) size field."""
    assert len(payload) < 0x7F
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big") \
        + bytes([0x80 | len(payload)]) + payload


def test_webm_ebml_golden():
    """Matroska element IDs straight from the public registry
    (RFC 8794 / Matroska spec): EBML header with DocType webm, one
    V_VP8 320x240 video track and one A_VORBIS 44100 Hz stereo audio
    track."""
    ebml_header = _ebml(
        0x1A45DFA3,
        _ebml(0x4286, b"\x01")  # EBMLVersion
        + _ebml(0x42F7, b"\x01")  # EBMLReadVersion
        + _ebml(0x42F2, b"\x04")  # EBMLMaxIDLength
        + _ebml(0x42F3, b"\x08")  # EBMLMaxSizeLength
        + _ebml(0x4282, b"webm")  # DocType
        + _ebml(0x4287, b"\x02")  # DocTypeVersion
        + _ebml(0x4285, b"\x02"),  # DocTypeReadVersion
    )
    video_entry = _ebml(
        0xAE,
        _ebml(0xD7, b"\x01")  # TrackNumber
        + _ebml(0x83, b"\x01")  # TrackType: video
        + _ebml(0x86, b"V_VP8")  # CodecID
        + _ebml(
            0xE0,  # Video
            _ebml(0xB0, struct.pack(">H", 320))  # PixelWidth
            + _ebml(0xBA, struct.pack(">H", 240)),  # PixelHeight
        ),
    )
    audio_entry = _ebml(
        0xAE,
        _ebml(0xD7, b"\x02")
        + _ebml(0x83, b"\x02")  # TrackType: audio
        + _ebml(0x86, b"A_VORBIS")
        + _ebml(
            0xE1,  # Audio
            _ebml(0xB5, struct.pack(">d", 44100.0))  # SamplingFrequency
            + _ebml(0x9F, b"\x02"),  # Channels
        ),
    )
    segment = _ebml(
        0x18538067, _ebml(0x1654AE6B, video_entry + audio_entry)
    )
    tracks = M.parse_webm_tracks(ebml_header + segment)
    assert tracks == [
        {"number": 1, "type": 1, "codec": "V_VP8", "width": 320,
         "height": 240, "rate": 0, "channels": 0},
        {"number": 2, "type": 2, "codec": "A_VORBIS", "width": 0,
         "height": 0, "rate": 44100, "channels": 2},
    ]


def _box(tag: bytes, payload: bytes) -> bytes:
    """ISO 14496-12 4.2 box: 32-bit size incl. header."""
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def test_heif_golden():
    """ISO 14496-12 box layout: ftyp(heic) + meta FullBox holding
    pitm/iinf/iprp->ipco->ispe, 640x480 primary item."""
    ftyp = _box(b"ftyp", b"heic" + struct.pack(">I", 0) + b"mif1")
    pitm = _box(b"pitm", struct.pack(">I", 0) + struct.pack(">H", 1))
    iinf = _box(b"iinf", struct.pack(">I", 0) + struct.pack(">H", 2))
    ispe = _box(
        b"ispe", struct.pack(">I", 0) + struct.pack(">II", 640, 480)
    )
    iprp = _box(b"iprp", _box(b"ipco", ispe))
    meta = _box(b"meta", struct.pack(">I", 0) + pitm + iinf + iprp)
    d = M.parse_heif(ftyp + meta)
    assert d == {
        "brand": "heic", "primary_item": 1, "n_items": 2,
        "width": 640, "height": 480, "n_extents": 1,
    }


def test_h264_sps_golden():
    """Hand-packed baseline SPS (7.3.2.1.1) for 1280x720: 80x45
    macroblocks, no cropping, poc_type 2, packed with the independent
    bit-packer above."""
    p = _Pack()
    p.u(66, 8)  # profile_idc: baseline
    p.u(0, 8)  # constraint flags + reserved
    p.u(31, 8)  # level_idc 3.1
    p.ue(0)  # seq_parameter_set_id
    p.ue(0)  # log2_max_frame_num_minus4
    p.ue(2)  # pic_order_cnt_type (no extra fields)
    p.ue(1)  # max_num_ref_frames
    p.u(0, 1)  # gaps_in_frame_num_value_allowed
    p.ue(79)  # pic_width_in_mbs_minus1 -> 80 mbs = 1280
    p.ue(44)  # pic_height_in_map_units_minus1 -> 45 units = 720
    p.u(1, 1)  # frame_mbs_only_flag
    p.u(1, 1)  # direct_8x8_inference_flag
    p.u(0, 1)  # frame_cropping_flag
    p.u(0, 1)  # vui_parameters_present_flag
    sps = V.parse_sps(p.bytes_aligned(stop_bit=True))
    assert sps["profile_idc"] == 66
    assert sps["level_idc"] == 31
    assert sps["width"] == 1280
    assert sps["height"] == 720
    assert sps["frame_mbs_only"] == 1
    assert sps["poc_type"] == 2
    assert sps["max_num_ref_frames"] == 1


def test_h264_sps_cropped_golden():
    """1080p needs cropping: 68 map units = 1088 rows, crop_bottom=4
    chroma units (8 luma rows) -> 1080 (7.4.2.1.1 arithmetic)."""
    p = _Pack()
    p.u(66, 8)
    p.u(0, 8)
    p.u(40, 8)  # level 4.0
    p.ue(0)
    p.ue(0)
    p.ue(2)
    p.ue(1)
    p.u(0, 1)
    p.ue(119)  # 120 mbs = 1920
    p.ue(67)  # 68 units = 1088
    p.u(1, 1)
    p.u(1, 1)
    p.u(1, 1)  # frame_cropping_flag
    p.ue(0)  # crop_left
    p.ue(0)  # crop_right
    p.ue(0)  # crop_top
    p.ue(4)  # crop_bottom: 4 * 2 = 8 luma rows (4:2:0 frame)
    p.u(0, 1)  # vui
    sps = V.parse_sps(p.bytes_aligned(stop_bit=True))
    assert sps["width"] == 1920
    assert sps["height"] == 1080


def test_av1_sequence_header_golden():
    """AV1 spec 5.5.1 single-operating-point sequence header,
    1920x1080 profile 2 level 8, hand-packed."""
    p = _Pack()
    p.u(2, 3)  # seq_profile
    p.u(0, 1)  # still_picture
    p.u(0, 1)  # reduced_still_picture_header
    p.u(0, 1)  # timing_info_present_flag
    p.u(0, 1)  # initial_display_delay_present_flag
    p.u(0, 5)  # operating_points_cnt_minus_1
    p.u(0, 12)  # operating_point_idc[0]
    p.u(8, 5)  # seq_level_idx[0] (> 7 -> seq_tier follows)
    p.u(0, 1)  # seq_tier[0]
    p.u(11, 4)  # frame_width_bits_minus_1 -> 12 bits
    p.u(10, 4)  # frame_height_bits_minus_1 -> 11 bits
    p.u(1919, 12)  # max_frame_width_minus_1
    p.u(1079, 11)  # max_frame_height_minus_1
    d = V.parse_av1_sequence_header(p.bytes_aligned())
    assert d["profile"] == 2
    assert d["still_picture"] == 0
    assert d["level"] == 8
    assert d["width"] == 1920
    assert d["height"] == 1080
