"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

Decode status (round 4): PNG, binary-PPM, baseline JPEG and GIF87a/89a
decode/resize/re-encode are REAL (dependency-free codecs in
``kernels/imagecodec.py`` / ``jpegcodec.py`` / ``gifcodec.py``), RIFF/WAVE
PCM audio decode + feature extraction is REAL (``kernels/wavcodec.py``),
FLAC decode is REAL (``kernels/flaccodec.py``, round 5), and
MJPEG-in-MP4 video frame decode is REAL (``kernels/mp4codec.py``) — so
``fake=False`` works end-to-end for those formats. The remaining SAMPLE
decoders (WebP pixels, MP3/AAC samples, inter-frame video H.264/VP9) are
documented permanent skips (external-validity argument in each kernel's
docstring) that raise NotImplementedError into the quarantine, where
production swaps in PIL/libvips/ffmpeg; ``fake=True`` keeps the
deterministic byte-stat path for them. Every skipped format still has a
REAL, tested METADATA tier (round 6): ``media_metadata`` walks headers
only — MP3/AAC frame layers (``mp3meta``/``aacmeta``), WebP containers
(``webpmeta``), H.264 SPS (``h264meta``), plus WAV/FLAC/MP4/PNG/JPEG/
GIF/PPM header reads. The Spark-side plumbing — schema, partitioning,
UDF signature, batch shape — is identical across all paths.

Error contract (F5 quarantine): a null, truncated, corrupt, or
unsupported-format payload yields NULL features plus an ``err`` tag
(``extract_media_features``) or passes through untouched
(``resize_images``) — one bad payload never aborts a corpus-wide job.

Scale notes: binary payloads ride the columnar path (Arrow buffers, no
base64); batch size is bounded by bytes not rows
(``maxRecordsPerBatch`` + small fixed batches here) so a 4K image batch
doesn't OOM a worker; metadata-only operations (filtering by width, codec,
duration) never touch the payload thanks to Parquet column pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURES_SCHEMA = (
    "media_id string, kind string, n_bytes int, sha1 string, "
    "feat array<float>, err string"
)


def _decode_image_bytes(payload: bytes, fake: bool):
    if fake:
        # deterministic fake "decode": 8 float features from byte stats
        n = len(payload) or 1
        head = payload[:64]
        return [
            float(n % 251),
            float(sum(head) % 997),
            float(head[0] if head else 0),
            float(head[-1] if head else 0),
            float(min(head) if head else 0),
            float(max(head) if head else 0),
            float(n % 17),
            float(n % 29),
        ]
    # REAL decode: PNG/PPM/baseline-JPEG/GIF (kernels/imagecodec.py
    # dispatch) and RIFF/WAVE PCM audio (kernels/wavcodec.py — same
    # 8-float feature shape, so FEATURES_SCHEMA holds across modalities);
    # WebP/compressed-audio raise NotImplementedError (caught by caller).
    if not payload:
        return None
    from xwikire_spark.kernels.aacmeta import decode_aac, sniff_aac
    from xwikire_spark.kernels.flaccodec import decode_flac, sniff_flac
    from xwikire_spark.kernels.imagecodec import channel_stats, decode_image
    from xwikire_spark.kernels.mp3meta import decode_mp3, sniff_mp3
    from xwikire_spark.kernels.webpmeta import decode_webp, sniff_webp
    from xwikire_spark.kernels.wavcodec import (
        audio_stats,
        decode_wav,
        sniff_wav,
    )

    if sniff_wav(payload):
        return audio_stats(*decode_wav(payload))
    if sniff_flac(payload):
        return audio_stats(*decode_flac(payload))
    if sniff_mp3(payload):
        # documented permanent decode skip (kernels/mp3meta.py):
        # raises NotImplementedError -> F5 quarantine "unsupported:" tag,
        # the same seam production swaps ffmpeg into. Frame-layer
        # metadata stays available via mp3meta.mp3_info.
        return decode_mp3(payload)
    if sniff_aac(payload):
        # same documented skip, kernels/aacmeta.py; aac_info serves the
        # metadata tier.
        return decode_aac(payload)
    if sniff_webp(payload):
        # same documented skip, kernels/webpmeta.py; webp_info serves the
        # metadata tier (previously fell through to decode_image's
        # NotImplementedError with a less specific tag).
        return decode_webp(payload)
    return channel_stats(*decode_image(payload))


def _safe_decode(payload: bytes, fake: bool):
    """(features, err) — F5 per-row quarantine around the real codecs: a
    truncated GIF, corrupt JPEG, or unsupported WebP payload yields
    (None, tag) instead of aborting the whole corpus job. The err tag keeps
    the failure observable (filter err IS NOT NULL = the quarantine table).
    """
    if not fake and not payload:
        return None, "empty_payload"
    try:
        return _decode_image_bytes(payload, fake), None
    except NotImplementedError as e:
        return None, f"unsupported: {e}"
    except Exception as e:  # corrupt payloads: ValueError/struct.error/...
        return None, f"decode_error: {type(e).__name__}: {e}"


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """media (MEDIA_SCHEMA) -> per-item features via mapInPandas.

    The payload column crosses to Python as raw bytes in Arrow buffers;
    the iterator form keeps at most one batch of payloads in memory.
    """

    def gen(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            feats, shas, sizes, errs = [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                sizes.append(len(b))
                shas.append(hashlib.sha1(b).hexdigest())
                f, e = _safe_decode(b, fake)
                feats.append(f)
                errs.append(e)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "sha1": shas,
                    "feat": feats,
                    "err": pd.Series(errs, dtype="object"),
                }
            )

    return media.mapInPandas(gen, FEATURES_SCHEMA)


METADATA_SCHEMA = (
    "media_id string, kind string, format string, n_bytes int, "
    "meta string, err string"
)


def _media_info_bytes(payload: bytes) -> tuple[str, dict]:
    """(format, metadata) from HEADERS ONLY — no pixel/sample decode, so
    the per-row cost is O(header bytes), not O(payload): the property
    that makes corpus-wide media indexing at 100 TB a metadata-sized job
    (audio frame walks touch 4-9 bytes per frame; images read one fixed
    header). Raises ValueError on corrupt/unknown payloads (quarantined
    by the caller)."""
    import struct

    from xwikire_spark.kernels.aacmeta import aac_info, sniff_aac
    from xwikire_spark.kernels.flaccodec import _parse_streaminfo, sniff_flac
    from xwikire_spark.kernels.imagecodec import sniff_format
    from xwikire_spark.kernels.mp3meta import mp3_info, sniff_mp3
    from xwikire_spark.kernels.mp4codec import sniff_mp4, video_samples
    from xwikire_spark.kernels.webpmeta import sniff_webp, webp_info
    from xwikire_spark.kernels.wavcodec import sniff_wav

    if sniff_wav(payload):
        # header-only RIFF walk: fmt for shape, data size for duration
        meta: dict = {}
        pos = 12
        while pos + 8 <= len(payload):
            fourcc = payload[pos:pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
            if fourcc == b"fmt " and size >= 16:
                fmt_tag, ch, rate, byterate, _ba, bits = struct.unpack(
                    "<HHIIHH", payload[pos + 8:pos + 24]
                )
                meta.update(
                    codec={1: "pcm", 2: "ms-adpcm", 6: "alaw", 7: "ulaw",
                           17: "ima-adpcm"}.get(fmt_tag, f"tag{fmt_tag}"),
                    channels=ch, sample_rate=rate, bits=bits,
                    byterate=byterate,
                )
            elif fourcc == b"data":
                meta["data_bytes"] = size
            pos += 8 + size + (size & 1)
        if "sample_rate" not in meta:
            raise ValueError("WAV has no fmt chunk")
        if meta.get("byterate") and "data_bytes" in meta:
            meta["duration_sec"] = meta["data_bytes"] / meta["byterate"]
        return "wav", meta
    if sniff_flac(payload):
        # STREAMINFO is mandatory-first: 4-byte magic + 4-byte block
        # header + 34-byte body
        info = _parse_streaminfo(payload[8:42])
        return "flac", {
            "sample_rate": info["rate"],
            "channels": info["channels"],
            "bits": info["bps"],
            "duration_sec": info["total"] / info["rate"],
            "md5": info["md5"].hex(),
        }
    if sniff_mp3(payload):
        return "mp3", mp3_info(payload)
    if sniff_aac(payload):
        return "aac", aac_info(payload)
    if sniff_webp(payload):
        return "webp", webp_info(payload)
    if sniff_mp4(payload):
        from xwikire_spark.kernels.mp4codec import video_codec_config

        t = video_samples(payload)
        dur = (
            (t.samples[-1][0] + 1) / t.timescale if t.samples else 0.0
        )
        meta = {
            "codec": t.fourcc, "width": t.width, "height": t.height,
            "timescale": t.timescale, "n_samples": len(t.samples),
            "duration_sec_lower_bound": dur,
        }
        cfg = video_codec_config(payload)
        if cfg is not None and cfg[1] == "avcC":
            from xwikire_spark.kernels.h264meta import avc_info

            meta["avc"] = avc_info(cfg[2])
        return "mp4", meta
    fmt = sniff_format(payload)
    if fmt == "png":
        if len(payload) < 26 or payload[12:16] != b"IHDR":
            raise ValueError("PNG too short for IHDR")
        w, h = struct.unpack(">II", payload[16:24])
        depth, color = payload[24], payload[25]
        channels = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}.get(color)
        if channels is None:
            raise ValueError(f"PNG bad color type {color}")
        return "png", {"width": w, "height": h, "bit_depth": depth,
                       "channels": channels, "palette": color == 3}
    if fmt == "gif":
        w, h = struct.unpack("<HH", payload[6:10])
        return "gif", {"width": w, "height": h,
                       "version": payload[3:6].decode("ascii", "replace")}
    if fmt == "ppm":
        fields: list[int] = []
        pos = 2
        while len(fields) < 3 and pos < min(len(payload), 256):
            c = payload[pos:pos + 1]
            if c == b"#":
                while pos < len(payload) and payload[pos] not in b"\n":
                    pos += 1
            elif c.isdigit():
                start = pos
                while payload[pos:pos + 1].isdigit():
                    pos += 1
                fields.append(int(payload[start:pos]))
            else:
                pos += 1
        if len(fields) < 3:
            raise ValueError("PPM header truncated")
        gray = payload[:2] == b"P5"
        return ("pgm" if gray else "ppm"), {
            "width": fields[0], "height": fields[1], "maxval": fields[2],
            "channels": 1 if gray else 3,
        }
    if fmt == "jpeg":
        # marker walk to the first SOF (C0-CF minus DHT/JPG/DAC)
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                raise ValueError(f"JPEG marker desync at byte {pos}")
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            (seglen,) = struct.unpack(">H", payload[pos + 2:pos + 4])
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[pos + 5:pos + 9])
                return "jpeg", {
                    "width": w, "height": h,
                    "channels": payload[pos + 9],
                    "progressive": marker == 0xC2,
                }
            if marker == 0xD9:
                break
            pos += 2 + seglen
        raise ValueError("JPEG has no SOF marker")
    raise ValueError("unknown media container")


def media_metadata(media: DataFrame) -> DataFrame:
    """media (MEDIA_SCHEMA) -> per-item typed metadata via mapInPandas:
    (format, meta-as-compact-JSON) per payload, with the same F5 per-row
    quarantine contract as ``extract_media_features`` (corrupt payload →
    NULL meta + err tag, never a job abort). Unlike the feature path this
    NEVER decodes samples/pixels — it serves the corpus-indexing tier
    (duration/bitrate/dimension histograms, format partitioning, storage
    planning) where decoding would be a 100-1000x overspend."""

    def gen(batches):
        import json

        import pandas as pd

        for pdf in batches:
            fmts, sizes, metas, errs = [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                sizes.append(len(b))
                if not b:
                    fmts.append(None)
                    metas.append(None)
                    errs.append("empty_payload")
                    continue
                try:
                    fmt, meta = _media_info_bytes(b)
                    fmts.append(fmt)
                    metas.append(
                        json.dumps(meta, sort_keys=True,
                                   separators=(",", ":"))
                    )
                    errs.append(None)
                except Exception as e:
                    fmts.append(None)
                    metas.append(None)
                    errs.append(f"meta_error: {type(e).__name__}: {e}")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "format": pd.Series(fmts, dtype="object"),
                    "n_bytes": sizes,
                    "meta": pd.Series(metas, dtype="object"),
                    "err": pd.Series(errs, dtype="object"),
                }
            )

    return media.mapInPandas(gen, METADATA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp —
    pure relational expansion (sequence + explode) over metadata only (no
    payload read, Parquet-pruned). Shows the partitioning shape: a long
    video fans out to many frame rows BEFORE the heavy decode, so decode
    parallelism is per-frame, not per-video (skew-proof for hour-long
    inputs). ``sample_video_frames`` is the matching REAL path (MJPEG-in-
    MP4 via kernels/mp4codec.py)."""
    from pyspark.sql import functions as F

    return (
        media.where(F.col("kind") == "video")
        .withColumn(
            "sample_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "mime", "sample_ms")
    )


FRAMES_SCHEMA = (
    "media_id string, sample_ms int, frame_idx int, frame binary, err string"
)


def sample_video_frames(
    media: DataFrame,
    every_ms: int = 1000,
    fake: bool = True,
    max_frames: int = 100_000,
) -> DataFrame:
    """Video -> sampled frame rows (FRAMES_SCHEMA): the REAL counterpart of
    ``frame_sample_plan``.

    Two-phase 100 TB shape: this stage only PARSES the MP4 sample index
    (kernels/mp4codec.py box walker) and SLICES the sampled frames'
    bytes out of mdat — cheap and I/O-bound; each output row carries one
    small frame payload, not the whole video. The heavy per-frame decode
    then runs downstream (``extract_media_features`` on the frame column,
    or ``mp4codec.decode_sample``) AFTER Spark redistributes the frame
    rows — so decode parallelism is per-frame even when one input is an
    hour-long video (the skew story frame_sample_plan documents).

    Timestamps: 0, every_ms, ... up to the track's last sample dts; each
    sample_ms maps to the frame on screen at that time (nearest previous).
    Works for any codec the demuxer can index; MJPEG frames are decodable
    in-container, H.264/VP9 slices come out as opaque bytes (tagged via
    ``err`` only when indexing fails — F5 quarantine, one corrupt video
    never aborts the corpus job).

    ``fake=True`` keeps the deterministic no-codec path (sha1-derived
    frame bytes at the metadata duration's cadence) for plumbing tests.

    ``max_frames`` bounds the sampled timeline per video: the timeline
    length derives from untrusted stts deltas (u32) x mdhd timescale, so a
    crafted-but-structurally-valid MP4 (one stts delta ~2^32 at
    timescale=1) would otherwise drive billions of loop iterations and
    unbounded list growth — a hang/OOM instead of a quarantined row. A
    video exceeding the bound raises inside the try and lands in the err
    column like any other malformed payload (the F5 contract), mirroring
    the count bounds inside mp4codec itself.
    """
    from pyspark.sql import functions as F

    def gen(batches):
        import hashlib

        import pandas as pd

        from xwikire_spark.kernels.mp4codec import frame_bytes, video_samples

        for pdf in batches:
            mids, ts, idxs, blobs, errs = [], [], [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                b = bytes(payload) if payload is not None else b""
                if fake:
                    d = 0 if pd.isna(dur) else int(dur)
                    for k, ms in enumerate(range(0, max(d, 1), every_ms)):
                        mids.append(mid)
                        ts.append(ms)
                        idxs.append(k)
                        blobs.append(
                            hashlib.sha1(b + str(ms).encode()).digest()
                        )
                        errs.append(None)
                    continue
                try:
                    if not b:
                        raise ValueError("empty payload")
                    track = video_samples(b)
                    last_ms = (
                        track.samples[-1][0] * 1000 // track.timescale
                    )
                    if last_ms // every_ms + 1 > max_frames:
                        raise ValueError(
                            f"sampled timeline {last_ms} ms at {every_ms} ms"
                            f" cadence exceeds max_frames={max_frames}"
                        )
                    sliced: dict[int, bytes] = {}
                    for ms in range(0, last_ms + 1, every_ms):
                        i = track.sample_at_ms(ms)
                        mids.append(mid)
                        ts.append(ms)
                        idxs.append(i)
                        # slice once per distinct frame: a low-fps video
                        # sampled at fine every_ms repeats frame indices
                        if i not in sliced:
                            sliced[i] = frame_bytes(b, track, i)
                        blobs.append(sliced[i])
                        errs.append(None)
                except Exception as e:
                    mids.append(mid)
                    ts.append(None)
                    idxs.append(None)
                    blobs.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "sample_ms": pd.Series(ts, dtype="object"),
                    "frame_idx": pd.Series(idxs, dtype="object"),
                    "frame": blobs,
                    "err": pd.Series(errs, dtype="object"),
                }
            )

    videos = media.where(F.col("kind") == "video").select(
        "media_id", "payload", "duration_ms"
    )
    return videos.mapInPandas(gen, FRAMES_SCHEMA)


def resize_images(
    media: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Image resize via mapInPandas: decode -> resize -> re-encode, with
    the codec step stubbed like the rest of this module (PIL/libvips not in
    the container). The Spark-side contract is real: binary payloads ride
    Arrow buffers both directions, metadata columns update, non-image rows
    pass through untouched. Fake mode emits a deterministic payload
    (sha1-derived bytes of the requested size class) so tests pin the
    round-trip schema and batch shape.
    """

    def gen(batches):
        import hashlib

        import pandas as pd

        from xwikire_spark.kernels.imagecodec import (
            decode_image,
            encode_image,
            resize_nearest,
            sniff_format,
        )

        for pdf in batches:
            payloads, widths, heights = [], [], []
            for payload, kind, w0, h0 in zip(
                pdf["payload"], pdf["kind"], pdf["width"], pdf["height"]
            ):
                b = bytes(payload) if payload is not None else b""
                if kind != "image" or not b:
                    # non-image rows AND null/empty payloads pass through
                    # with their ORIGINAL metadata intact (one missing
                    # payload must not abort a corpus-wide resize job)
                    payloads.append(b)
                    widths.append(None if pd.isna(w0) else int(w0))
                    heights.append(None if pd.isna(h0) else int(h0))
                    continue
                if not fake:
                    # REAL path: PNG/PPM/baseline-JPEG/GIF decode ->
                    # nearest-neighbor resample -> family-preserving
                    # re-encode. Corrupt or unsupported (WebP) payloads
                    # pass through untouched with original metadata — the
                    # same F5 quarantine as the null-payload branch above.
                    try:
                        w1, h1, ch, px = decode_image(b)
                        rp = resize_nearest(w1, h1, ch, px, width, height)
                        payloads.append(
                            encode_image(
                                sniff_format(b), width, height, ch, rp
                            )
                        )
                    except Exception:
                        payloads.append(b)
                        widths.append(None if pd.isna(w0) else int(w0))
                        heights.append(None if pd.isna(h0) else int(h0))
                        continue
                else:
                    seed = hashlib.sha1(
                        b + f"{width}x{height}".encode()
                    ).digest()
                    payloads.append(
                        (seed * (width * height // len(seed) + 1))[
                            : width * height
                        ]
                    )
                widths.append(width)
                heights.append(height)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "mime": pdf["mime"],
                    "width": pd.Series(widths, dtype="object"),
                    "height": pd.Series(heights, dtype="object"),
                    "duration_ms": pdf["duration_ms"],
                }
            )

    return media.mapInPandas(gen, MEDIA_SCHEMA)
