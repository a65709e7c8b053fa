"""H.264/AVC sequence-parameter-set metadata: Exp-Golomb SPS parsing for
profile / level / chroma format / bit depth / coded dimensions — the
indexing tier for inter-frame video, WITHOUT a sample decoder (the last
multimodal stub family gets the same treatment as MP3/AAC/WebP:
metadata real and tested, sample decode a documented permanent skip).

Why full H.264 decode is PERMANENTLY out of scope (the WebP/MP3/AAC
external-validity argument — see COVERAGE.md): a correct decoder needs
CABAC context tables, intra-prediction and deblocking semantics, and
inter-frame motion compensation reproduced verbatim from ITU-T H.264 —
hundreds of pages; a from-memory implementation "validated" by its own
encoder proves nothing, and the bitstream carries no checksum of the
decoded pictures. Production routes through ffmpeg behind the
``operators/multimodal.py`` quarantine seam (``mp4codec.decode_sample``
already raises for non-MJPEG tracks).

The SPS, by contrast, is a few dozen Exp-Golomb fields with published
layout (ITU-T H.264 §7.3.2.1.1) and an arithmetic dimension formula:

    width  = (pic_width_in_mbs_minus1 + 1) * 16
             - CropUnitX * (crop_left + crop_right)
    height = (2 - frame_mbs_only) * (pic_height_in_map_units_minus1 + 1)
             * 16 - CropUnitY * (crop_top + crop_bottom)

fully checkable by construction: the tests hand-pack SPS bitstreams with
an independent Exp-Golomb writer and known dimensions (1080p needs the
8-line bottom crop — 1088 coded lines — which pins the crop arithmetic).

``avc_info`` takes an ISO 14496-15 AVCDecoderConfigurationRecord (the
``avcC`` box body ``mp4codec.video_codec_config`` extracts), strips the
RBSP emulation-prevention bytes, and parses the first SPS.
"""

from __future__ import annotations

_PROFILES = {
    66: "Baseline", 77: "Main", 88: "Extended", 100: "High",
    110: "High 10", 122: "High 4:2:2", 244: "High 4:4:4",
    44: "CAVLC 4:4:4",
}

# profiles whose SPS carries the chroma/bit-depth/scaling section
_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139,
                  134, 135}


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("SPS truncated mid-field")
            out = (out << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out

    def ue(self) -> int:
        """Exp-Golomb unsigned: count leading zeros, read that many more
        bits, value = 2^z - 1 + suffix."""
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("SPS Exp-Golomb run too long (corrupt)")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def strip_emulation(rbsp: bytes) -> bytes:
    """Remove the 0x03 emulation-prevention byte from every 00 00 03
    sequence (§7.4.1.1)."""
    out = bytearray()
    i = 0
    while i < len(rbsp):
        if (
            i + 2 < len(rbsp)
            and rbsp[i] == 0 and rbsp[i + 1] == 0 and rbsp[i + 2] == 3
        ):
            out += rbsp[i:i + 2]
            i += 3
        else:
            out.append(rbsp[i])
            i += 1
    return bytes(out)


def _skip_scaling_list(br: _BitReader, size: int) -> None:
    last, nxt = 8, 8
    for _ in range(size):
        if nxt != 0:
            nxt = (last + br.se() + 256) % 256
        last = nxt if nxt != 0 else last


def parse_sps(nal: bytes) -> dict:
    """Parse one SPS NAL unit (header byte included, emulation bytes
    still in) -> {profile, profile_idc, level, chroma_format,
    bit_depth_luma, bit_depth_chroma, width, height, frame_mbs_only,
    max_num_ref_frames}. Raises ValueError on non-SPS or corrupt
    input."""
    if not nal:
        raise ValueError("empty NAL")
    if nal[0] & 0x80:
        raise ValueError("forbidden_zero_bit set")
    if nal[0] & 0x1F != 7:
        raise ValueError(f"not an SPS NAL (type {nal[0] & 0x1F})")
    br = _BitReader(strip_emulation(nal[1:]))
    profile_idc = br.u(8)
    br.u(8)  # constraint flags + reserved
    level_idc = br.u(8)
    br.ue()  # sps_id
    chroma_format, depth_l, depth_c = 1, 8, 8
    if profile_idc in _HIGH_PROFILES:
        chroma_format = br.ue()
        if chroma_format == 3:
            br.u(1)  # separate_colour_plane
        depth_l = br.ue() + 8
        depth_c = br.ue() + 8
        br.u(1)  # qpprime_y_zero_transform_bypass
        if br.u(1):  # seq_scaling_matrix_present
            for i in range(8 if chroma_format != 3 else 12):
                if br.u(1):
                    _skip_scaling_list(br, 16 if i < 6 else 64)
    br.ue()  # log2_max_frame_num_minus4
    poc_type = br.ue()
    if poc_type == 0:
        br.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        br.u(1)  # delta_pic_order_always_zero
        br.se()  # offset_for_non_ref_pic
        br.se()  # offset_for_top_to_bottom_field
        for _ in range(br.ue()):
            br.se()
    max_ref = br.ue()
    br.u(1)  # gaps_in_frame_num_value_allowed
    w_mbs = br.ue() + 1
    h_units = br.ue() + 1
    frame_mbs_only = br.u(1)
    if not frame_mbs_only:
        br.u(1)  # mb_adaptive_frame_field
    br.u(1)  # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if br.u(1):  # frame_cropping
        crop_l, crop_r, crop_t, crop_b = br.ue(), br.ue(), br.ue(), br.ue()
    # CropUnit (§7.4.2.1.1): from the chroma sampling grid
    if chroma_format == 0 or chroma_format == 3:
        unit_x, unit_y = 1, 2 - frame_mbs_only
    elif chroma_format == 1:  # 4:2:0
        unit_x, unit_y = 2, 2 * (2 - frame_mbs_only)
    else:  # 4:2:2
        unit_x, unit_y = 2, 2 - frame_mbs_only
    width = w_mbs * 16 - unit_x * (crop_l + crop_r)
    height = (2 - frame_mbs_only) * h_units * 16 - unit_y * (
        crop_t + crop_b
    )
    return {
        "profile": _PROFILES.get(profile_idc, f"profile{profile_idc}"),
        "profile_idc": profile_idc,
        "level": level_idc / 10.0,
        "chroma_format": {0: "monochrome", 1: "4:2:0", 2: "4:2:2",
                          3: "4:4:4"}[chroma_format],
        "bit_depth_luma": depth_l,
        "bit_depth_chroma": depth_c,
        "width": width,
        "height": height,
        "frame_mbs_only": bool(frame_mbs_only),
        "max_num_ref_frames": max_ref,
    }


def avc_info(avcc: bytes) -> dict:
    """Parse an AVCDecoderConfigurationRecord (ISO 14496-15 §5.3.3.1 —
    the 'avcC' box body): configuration sanity + the first SPS's
    metadata, plus nal_length_size (the sample-framing parameter a
    demuxer needs)."""
    if len(avcc) < 7:
        raise ValueError("avcC record truncated")
    if avcc[0] != 1:
        raise ValueError(f"avcC configurationVersion {avcc[0]} != 1")
    nal_len = (avcc[4] & 3) + 1
    n_sps = avcc[5] & 0x1F
    if n_sps < 1:
        raise ValueError("avcC carries no SPS")
    pos = 6
    if pos + 2 > len(avcc):
        raise ValueError("avcC record truncated")
    sps_len = int.from_bytes(avcc[pos:pos + 2], "big")
    sps = avcc[pos + 2:pos + 2 + sps_len]
    if len(sps) < sps_len:
        raise ValueError("avcC SPS truncated")
    info = parse_sps(sps)
    info["nal_length_size"] = nal_len
    info["n_sps"] = n_sps
    return info


def decode_avc(payload: bytes):
    """Sample decode is a DOCUMENTED PERMANENT SKIP (module docstring);
    production routes through ffmpeg at this seam
    (``mp4codec.decode_sample`` raises for avc1 tracks already)."""
    raise NotImplementedError(
        "H.264 sample decode needs ffmpeg in production; SPS metadata "
        "is available via avc_info()/parse_sps()"
    )
