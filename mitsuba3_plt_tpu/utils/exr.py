"""OpenEXR scanline image I/O (read: NONE/ZIP/ZIPS/PIZ, write: ZIP).

The reference reads and writes EXR through the OpenEXR library
(reference src/core/bitmap.cpp); every shipped render under
reference results/ and every scene asset (envmaps, reference images) is a
PIZ-compressed HALF scanline EXR. This module parses the container in
Python and delegates PIZ block decoding to the native codec
(native/exr_piz.cpp via ctypes); ZIP/ZIPS/NONE are handled with the
stdlib zlib. The writer emits ZIP-compressed scanline files readable by
OpenEXR.
"""
from __future__ import annotations

import ctypes
import struct
import zlib

import numpy as np

MAGIC = 0x01312F76

# compression codes (EXR spec)
NO_COMPRESSION = 0
RLE_COMPRESSION = 1
ZIPS_COMPRESSION = 2
ZIP_COMPRESSION = 3
PIZ_COMPRESSION = 4

_LINES_PER_BLOCK = {
    NO_COMPRESSION: 1,
    RLE_COMPRESSION: 1,
    ZIPS_COMPRESSION: 1,
    ZIP_COMPRESSION: 16,
    PIZ_COMPRESSION: 32,
}

# pixel type codes
UINT = 0
HALF = 1
FLOAT = 2
_DTYPE = {UINT: np.dtype("<u4"), HALF: np.dtype("<f2"), FLOAT: np.dtype("<f4")}


def _native_piz():
    from ..scene import native

    lib = native._load()
    if lib is None:
        raise RuntimeError("native EXR codec unavailable (no C++ toolchain)")
    if not getattr(lib, "_piz_ready", False):
        lib.piz_uncompress.restype = ctypes.c_int
        lib.piz_uncompress.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint16), ctypes.c_int,
        ]
        lib._piz_ready = True
    return lib


def _parse_header(data: bytes):
    magic, version = struct.unpack_from("<ii", data, 0)
    if magic != MAGIC:
        raise ValueError("not an EXR file")
    if version & 0x200:
        raise ValueError("tiled EXR not supported")
    if version & 0x1000:
        raise ValueError("multi-part EXR not supported")
    off = 8
    attrs = {}
    while data[off] != 0:
        end = data.index(b"\x00", off)
        name = data[off:end].decode()
        off = end + 1
        end = data.index(b"\x00", off)
        typ = data[off:end].decode()
        off = end + 1
        (size,) = struct.unpack_from("<i", data, off)
        off += 4
        attrs[name] = (typ, data[off:off + size])
        off += size
    off += 1  # trailing null
    return attrs, off


def _parse_chlist(val: bytes):
    """-> list of (name, pixel_type) in file (alphabetical) order."""
    chans = []
    o = 0
    while val[o] != 0:
        e = val.index(b"\x00", o)
        name = val[o:e].decode()
        o = e + 1
        (ptype,) = struct.unpack_from("<i", val, o)
        # ptype(4) pLinear(1) reserved(3) xSampling(4) ySampling(4)
        xs, ys = struct.unpack_from("<ii", val, o + 8)
        if xs != 1 or ys != 1:
            raise ValueError("subsampled channels not supported")
        o += 16
        chans.append((name, ptype))
    return chans


def _unpredict(buf: bytearray) -> bytes:
    """Undo OpenEXR's ZIP post-deflate transform: delta + deinterleave."""
    raw = np.frombuffer(bytes(buf), np.uint8)
    # stored stream is [x0, x1-x0+128, x2-x1+128, ...]; invert with a cumsum
    d = (np.cumsum(raw.astype(np.int64) - 128) + 128).astype(np.uint8)
    n = len(d)
    half = (n + 1) // 2
    out = np.empty(n, np.uint8)
    out[0::2] = d[:half]
    out[1::2] = d[half:]
    return out.tobytes()


def _predict(data: bytes) -> bytes:
    """Forward transform for writing: interleave-split + delta."""
    arr = np.frombuffer(data, np.uint8)
    n = len(arr)
    half = (n + 1) // 2
    split = np.empty(n, np.uint8)
    split[:half] = arr[0::2]
    split[half:] = arr[1::2]
    s = split.astype(np.int64)
    d = np.empty(n, np.int64)
    d[0] = s[0]
    d[1:] = s[1:] - s[:-1] + 128
    return (d & 0xFF).astype(np.uint8).tobytes()


def read_exr(path: str):
    """Read a scanline EXR. Returns (channels, attrs) where channels maps
    channel name -> float32 [h, w] array (UINT channels stay uint32)."""
    with open(path, "rb") as f:
        data = f.read()
    attrs, off = _parse_header(data)
    chans = _parse_chlist(attrs["channels"][1])
    comp = attrs["compression"][1][0]
    xmin, ymin, xmax, ymax = struct.unpack("<4i", attrs["dataWindow"][1])
    w = xmax - xmin + 1
    h = ymax - ymin + 1
    if comp not in _LINES_PER_BLOCK:
        raise ValueError(f"unsupported compression {comp}")
    lpb = _LINES_PER_BLOCK[comp]
    nblocks = (h + lpb - 1) // lpb

    # line-offset table
    offsets = struct.unpack_from(f"<{nblocks}q", data, off)
    off += 8 * nblocks

    row_bytes = sum(w * _DTYPE[pt].itemsize for _, pt in chans)
    out = {name: np.empty((h, w), _DTYPE[pt]) for name, pt in chans}

    lib = None
    if comp == PIZ_COMPRESSION:
        lib = _native_piz()
        csize = (ctypes.c_int * len(chans))(
            *[_DTYPE[pt].itemsize // 2 for _, pt in chans]
        )
        cnx = (ctypes.c_int * len(chans))(*[w] * len(chans))

    for b in range(nblocks):
        o = offsets[b]
        y, nbytes = struct.unpack_from("<ii", data, o)
        o += 8
        y0 = y - ymin
        ny = min(lpb, h - y0)
        raw_size = row_bytes * ny
        chunk = data[o:o + nbytes]
        if nbytes >= raw_size and comp != PIZ_COMPRESSION:
            raw = chunk[:raw_size]
        elif comp == NO_COMPRESSION:
            raw = chunk[:raw_size]
        elif comp in (ZIP_COMPRESSION, ZIPS_COMPRESSION):
            if nbytes == raw_size:
                raw = chunk
            else:
                raw = _unpredict(bytearray(zlib.decompress(chunk)))
        elif comp == PIZ_COMPRESSION:
            if nbytes == raw_size:
                raw = chunk
            else:
                n_u16 = raw_size // 2
                buf = (ctypes.c_uint16 * n_u16)()
                rc = lib.piz_uncompress(
                    chunk, len(chunk), len(chans), csize, cnx, ny, buf, n_u16
                )
                if rc != 0:
                    raise ValueError(f"PIZ decode failed (code {rc}) at block {b}")
                raw = bytes(buf)
        else:
            raise ValueError(f"unsupported compression {comp}")

        # scanline-interleaved: per line, per channel
        ro = 0
        for ly in range(ny):
            for name, pt in chans:
                nb = w * _DTYPE[pt].itemsize
                out[name][y0 + ly] = np.frombuffer(
                    raw[ro:ro + nb], _DTYPE[pt]
                )
                ro += nb

    channels = {}
    for name, pt in chans:
        a = out[name]
        channels[name] = a.astype(np.float32) if pt != UINT else a
    return channels, attrs


def read_exr_rgb(path: str) -> np.ndarray:
    """Read an EXR as [h, w, 3] float32 (R, G, B). Single-channel files are
    broadcast; RGBA drops alpha."""
    channels, _ = read_exr(path)
    if all(k in channels for k in "RGB"):
        return np.stack([channels["R"], channels["G"], channels["B"]], -1)
    if "Y" in channels:
        return np.repeat(channels["Y"][..., None], 3, -1)
    vals = list(channels.values())
    if len(vals) == 1:
        return np.repeat(vals[0][..., None], 3, -1)
    raise ValueError(f"unsupported channel set {sorted(channels)}")


def _attr(name: str, typ: str, val: bytes) -> bytes:
    return (name.encode() + b"\x00" + typ.encode() + b"\x00"
            + struct.pack("<i", len(val)) + val)


def write_exr(path: str, img: np.ndarray, channel_names=None, half=True):
    """Write [h, w] or [h, w, C] float data as a ZIP-compressed scanline EXR."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    h, w, nc = img.shape
    if channel_names is None:
        channel_names = ["Y"] if nc == 1 else list("RGBA"[:nc])
    assert len(channel_names) == nc
    ptype = HALF if half else FLOAT
    dt = _DTYPE[ptype]

    # channels sorted alphabetically as the spec requires
    order = sorted(range(nc), key=lambda i: channel_names[i])
    chlist = b""
    for i in order:
        chlist += (channel_names[i].encode() + b"\x00"
                   + struct.pack("<i", ptype) + b"\x00" * 4
                   + struct.pack("<ii", 1, 1))
    chlist += b"\x00"

    dw = struct.pack("<4i", 0, 0, w - 1, h - 1)
    header = b"".join([
        struct.pack("<ii", MAGIC, 2),
        _attr("channels", "chlist", chlist),
        _attr("compression", "compression", bytes([ZIP_COMPRESSION])),
        _attr("dataWindow", "box2i", dw),
        _attr("displayWindow", "box2i", dw),
        _attr("lineOrder", "lineOrder", b"\x00"),
        _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0)),
        _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0)),
        _attr("screenWindowWidth", "float", struct.pack("<f", 1.0)),
        b"\x00",
    ])

    lpb = _LINES_PER_BLOCK[ZIP_COMPRESSION]
    nblocks = (h + lpb - 1) // lpb
    blocks = []
    for b in range(nblocks):
        y0 = b * lpb
        ny = min(lpb, h - y0)
        rows = []
        for ly in range(y0, y0 + ny):
            for i in order:
                rows.append(img[ly, :, i].astype(dt).tobytes())
        raw = b"".join(rows)
        comp = zlib.compress(_predict(raw), 6)
        if len(comp) >= len(raw):
            comp = raw
        blocks.append((y0, comp))

    table_off = len(header) + 8 * nblocks
    offsets = []
    pos = table_off
    for y0, comp in blocks:
        offsets.append(pos)
        pos += 8 + len(comp)
    with open(path, "wb") as f:
        f.write(header)
        f.write(struct.pack(f"<{nblocks}q", *offsets))
        for y0, comp in blocks:
            f.write(struct.pack("<ii", y0, len(comp)))
            f.write(comp)
