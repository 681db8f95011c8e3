"""Generate the committed real-world-layout GeoTIFF fixtures.

A standalone mini TIFF writer (independent of ssrs_tpu.data.tiffcore's
decode logic) that emits the layouts GDAL/USGS actually produce for
DEMs, so the decoder is pinned against bytes it did not write itself:

- dem_tiled_deflate_pred3_f32.tif : float32, 64x64 tiles, Deflate,
  floating-point predictor (the GDAL `-co COMPRESS=DEFLATE
  -co PREDICTOR=3 -co TILED=YES` DEM standard), GDAL nodata -9999
- dem_strip_lzw_pred2_i16.tif    : int16 strips, LZW, horizontal
  predictor
- dem_bigtiff_deflate_f32.tif    : BigTIFF (version 43), float32
  strips, Deflate
- dem_be_packbits_u16.tif        : big-endian ('MM'), uint16 strips,
  PackBits
- rgb_3band_u8.tif               : 3-band chunky uint8, uncompressed
  (band selection)
- dem_planar_deflate_i16.tif     : 2-band PLANAR (PlanarConfig=2)
  int16 strips, Deflate

Each fixture's source array is saved alongside as <name>.npy; the test
asserts byte-exact decode. Run from the repo root:
    python scripts/make_tiff_fixtures.py
"""

import os
import struct
import sys
import zlib

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tests', 'fixtures', 'tiff')


def lzw_encode(data: bytes) -> bytes:
    """TIFF LZW encoder (MSB-first, early change)."""
    CLEAR, EOI = 256, 257
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    acc = nbits = 0
    out = bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(CLEAR)
    w = b''
    for byte in data:
        c = bytes([byte])
        if w + c in table:
            w = w + c
            continue
        emit(table[w])
        table[w + c] = next_code
        next_code += 1
        # width schedule pinned against libtiff (the Pillow/libtiff
        # cross-check in tests/test_tiff_real.py): the decoder reads
        # code m at width w+1 once its table length (257+m) reaches
        # (1 << w) - 1, i.e. the encoder bumps when next_code hits
        # 1 << width
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4094:  # table nearly full: restart
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        emit(table[w])
    emit(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Simple PackBits: literal runs only for mixed data, RLE for
    repeats >= 3."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i + 1
        while (j < n and j - i < 128
               and not (j + 2 < n and data[j] == data[j + 1]
                        == data[j + 2])):
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def pred2_encode(block: np.ndarray) -> np.ndarray:
    """Horizontal differencing with wraparound, per row, per sample
    (block: rows x cols x samples, native int dtype)."""
    info = np.iinfo(block.dtype)
    span = int(info.max) - int(info.min) + 1
    wide = block.astype(np.int64)
    enc = wide.copy()
    enc[:, 1:] = (wide[:, 1:] - wide[:, :-1]) % span
    # re-wrap into the original dtype's range
    if info.min < 0:
        enc = np.where(enc > info.max, enc - span, enc)
    return enc.astype(block.dtype)


def pred3_encode(block: np.ndarray, byteorder: str) -> bytes:
    """Floating-point predictor: split each row's samples into
    byte-significance planes (MSB plane first), then byte-diff."""
    rows, cols, samples = block.shape
    itemsize = block.dtype.itemsize
    be = block.astype(np.dtype(block.dtype).newbyteorder('>'))
    row_bytes = be.reshape(rows, cols * samples).view(np.uint8) \
        .reshape(rows, cols * samples, itemsize)
    planes = np.transpose(row_bytes, (0, 2, 1)).reshape(
        rows, itemsize * cols * samples)
    enc = planes.astype(np.int16)
    enc[:, 1:] = (enc[:, 1:] - enc[:, :-1]) % 256
    return enc.astype(np.uint8).tobytes()


TYPE_SHORT, TYPE_LONG, TYPE_ASCII, TYPE_DOUBLE = 3, 4, 2, 12
TYPE_LONG8 = 16


class Writer:
    def __init__(self, byteorder='<', bigtiff=False):
        self.bo = byteorder
        self.big = bigtiff
        self.blobs = []          # (placeholder_id, bytes)
        self.entries = []        # (tag, type, count, packed or blobref)

    def add_blob(self, data: bytes) -> int:
        self.blobs.append(data)
        return len(self.blobs) - 1

    def tag(self, tag, ftype, values):
        if ftype == TYPE_ASCII:
            raw = values.encode('latin-1') + b'\0'
            count = len(raw)
            self.entries.append((tag, ftype, count, ('inline_or_blob',
                                                     raw)))
            return
        letter = {TYPE_SHORT: 'H', TYPE_LONG: 'I', TYPE_DOUBLE: 'd',
                  TYPE_LONG8: 'Q'}[ftype]
        raw = struct.pack(f'{self.bo}{len(values)}{letter}', *values)
        self.entries.append((tag, ftype, len(values),
                             ('inline_or_blob', raw)))

    def build(self) -> bytes:
        bo, big = self.bo, self.big
        valsize = 8 if big else 4
        esize = 20 if big else 12
        cntfmt = 'Q' if big else 'I'
        header_len = 16 if big else 8
        # layout: header | data blobs | ifd | out-of-line tag values
        offsets = []
        pos = header_len
        for blob in self.blobs:
            offsets.append(pos)
            pos += len(blob)
            pos += (-pos) % 2
        ifd_off = pos
        n = len(self.entries)
        ifd_len = (8 + n * esize + 8) if big else (2 + n * esize + 4)
        tagdata_off = ifd_off + ifd_len

        if big:
            # version 43, offset size 8, reserved 0, 8-byte IFD offset
            out = bytearray((b'II' if bo == '<' else b'MM')
                            + struct.pack(bo + 'HHH', 43, 8, 0)
                            + struct.pack(bo + 'Q', ifd_off))
        else:
            out = bytearray((b'II' if bo == '<' else b'MM')
                            + struct.pack(bo + 'H', 42)
                            + struct.pack(bo + 'I', ifd_off))
        for blob, off in zip(self.blobs, offsets):
            out += b'\0' * (off - len(out))
            out += blob
        out += b'\0' * (ifd_off - len(out))

        tail = bytearray()
        entries_sorted = sorted(self.entries, key=lambda e: e[0])
        if big:
            out += struct.pack(bo + 'Q', len(entries_sorted))
        else:
            out += struct.pack(bo + 'H', len(entries_sorted))
        for tag, ftype, count, (_, raw) in entries_sorted:
            out += struct.pack(bo + 'HH', tag, ftype)
            out += struct.pack(bo + cntfmt, count)
            if len(raw) <= valsize:
                out += raw + b'\0' * (valsize - len(raw))
            else:
                addr = tagdata_off + len(tail)
                out += struct.pack(bo + ('Q' if big else 'I'), addr)
                tail += raw
                tail += b'\0' * ((-len(tail)) % 2)
        out += struct.pack(bo + ('Q' if big else 'I'), 0)  # next IFD
        out += tail
        return bytes(out)


def compress(payload: bytes, compression: int) -> bytes:
    if compression == 1:
        return payload
    if compression == 8:
        return zlib.compress(payload, 6)
    if compression == 5:
        return lzw_encode(payload)
    if compression == 32773:
        return packbits_encode(payload)
    raise ValueError(compression)


def write_fixture(path, arr, *, tile=None, compression=8, predictor=1,
                  bigtiff=False, byteorder='<', planar=1, nodata=None,
                  rows_per_strip=32):
    if arr.ndim == 2:
        arr3 = arr[:, :, None]
    else:
        arr3 = arr
    h, w, s = arr3.shape
    dt = arr3.dtype
    kind = {'u': 1, 'i': 2, 'f': 3}[dt.kind]
    bits = dt.itemsize * 8
    wtr = Writer(byteorder=byteorder, bigtiff=bigtiff)

    def encode_block(block):
        # block: rows x cols x samples (native order)
        if predictor == 2:
            block = pred2_encode(block)
        if predictor == 3:
            payload = pred3_encode(block, byteorder)
        else:
            payload = block.astype(
                np.dtype(dt).newbyteorder(byteorder)).tobytes()
        return compress(payload, compression)

    blocks = []
    if tile:
        tw, tl = tile
        for plane in ([None] if planar == 1
                      else list(range(s))):
            for ti in range(-(-h // tl)):
                for tj in range(-(-w // tw)):
                    pad = np.zeros(
                        (tl, tw, s if planar == 1 else 1), dt)
                    rs, cs = ti * tl, tj * tw
                    rr, cc = min(tl, h - rs), min(tw, w - cs)
                    src = arr3[rs:rs + rr, cs:cs + cc]
                    if planar == 2:
                        src = src[:, :, plane:plane + 1]
                    pad[:rr, :cc] = src
                    blocks.append(encode_block(pad))
    else:
        for plane in ([None] if planar == 1 else list(range(s))):
            for r0 in range(0, h, rows_per_strip):
                rr = min(rows_per_strip, h - r0)
                src = arr3[r0:r0 + rr]
                if planar == 2:
                    src = src[:, :, plane:plane + 1]
                blocks.append(encode_block(src))

    for b in blocks:
        wtr.add_blob(b)

    otype = TYPE_LONG8 if bigtiff else TYPE_LONG
    wtr.tag(IMAGE_WIDTH, TYPE_LONG, (w,))
    wtr.tag(IMAGE_LENGTH, TYPE_LONG, (h,))
    wtr.tag(BITS_PER_SAMPLE, TYPE_SHORT, (bits,) * s)
    wtr.tag(COMPRESSION, TYPE_SHORT, (compression,))
    wtr.tag(262, TYPE_SHORT, (1,))  # photometric: min-is-black
    wtr.tag(SAMPLES_PER_PIXEL, TYPE_SHORT, (s,))
    wtr.tag(PLANAR_CONFIG, TYPE_SHORT, (planar,))
    wtr.tag(SAMPLE_FORMAT, TYPE_SHORT, (kind,) * s)
    if predictor != 1:
        wtr.tag(PREDICTOR, TYPE_SHORT, (predictor,))
    if nodata is not None:
        wtr.tag(GDAL_NODATA, TYPE_ASCII, str(nodata))
    # GeoTIFF georeferencing (1 deg x 1 deg box at (-106, 42))
    wtr.tag(33550, TYPE_DOUBLE, (1.0 / w, 1.0 / h, 0.0))
    wtr.tag(33922, TYPE_DOUBLE, (0., 0., 0., -106.0, 43.0, 0.))
    wtr.tag(34735, TYPE_SHORT,
            (1, 1, 0, 2, 1024, 0, 1, 2, 2048, 0, 1, 4326))

    # placeholder offsets resolved after build layout: rebuild with
    # final offsets (two-pass: sizes are stable)
    counts = tuple(len(b) for b in blocks)
    if tile:
        wtr.tag(TILE_WIDTH, TYPE_LONG, (tile[0],))
        wtr.tag(TILE_LENGTH, TYPE_LONG, (tile[1],))
        wtr.tag(TILE_BYTE_COUNTS, TYPE_LONG, counts)
        wtr.tag(TILE_OFFSETS, otype, (0,) * len(blocks))
    else:
        wtr.tag(ROWS_PER_STRIP, TYPE_LONG, (rows_per_strip,))
        wtr.tag(STRIP_BYTE_COUNTS, TYPE_LONG, counts)
        wtr.tag(STRIP_OFFSETS, otype, (0,) * len(blocks))

    # pass 1 for layout, then patch the offsets tag and rebuild
    header_len = 16 if bigtiff else 8
    offsets = []
    pos = header_len
    for b in blocks:
        offsets.append(pos)
        pos += len(b) + ((-len(b)) % 2)
    key = TILE_OFFSETS if tile else STRIP_OFFSETS
    wtr.entries = [e for e in wtr.entries if e[0] != key]
    wtr.tag(key, otype, tuple(offsets))
    data = wtr.build()
    with open(path, 'wb') as fobj:
        fobj.write(data)
    return data


# tag aliases (keep in sync with tiffcore)
IMAGE_WIDTH, IMAGE_LENGTH, BITS_PER_SAMPLE = 256, 257, 258
COMPRESSION, STRIP_OFFSETS, SAMPLES_PER_PIXEL = 259, 273, 277
ROWS_PER_STRIP, STRIP_BYTE_COUNTS, PLANAR_CONFIG = 278, 279, 284
PREDICTOR, TILE_WIDTH, TILE_LENGTH = 317, 322, 323
TILE_OFFSETS, TILE_BYTE_COUNTS, SAMPLE_FORMAT = 324, 325, 339
GDAL_NODATA = 42113


def synth_dem(h, w, dtype, nodata=None, seed=0):
    rng = np.random.default_rng(seed)
    y = np.linspace(0, np.pi, h)[:, None]
    x = np.linspace(0, 2 * np.pi, w)[None, :]
    z = 1800 + 600 * np.sin(x) * np.cos(y) + 15 * rng.random((h, w))
    if np.issubdtype(dtype, np.integer):
        z = np.round(z)
    z = z.astype(dtype)
    if nodata is not None:
        z[5:9, 7:15] = nodata
    return z


def main():
    os.makedirs(OUT, exist_ok=True)

    def save(name, arr, **kw):
        write_fixture(os.path.join(OUT, name + '.tif'), arr, **kw)
        np.save(os.path.join(OUT, name + '.npy'), arr)
        print(name, arr.shape, arr.dtype,
              os.path.getsize(os.path.join(OUT, name + '.tif')), 'bytes')

    save('dem_tiled_deflate_pred3_f32',
         synth_dem(150, 130, np.float32, nodata=-9999.0),
         tile=(64, 64), compression=8, predictor=3, nodata=-9999.0)
    save('dem_strip_lzw_pred2_i16', synth_dem(90, 140, np.int16),
         compression=5, predictor=2, rows_per_strip=16)
    save('dem_bigtiff_deflate_f32', synth_dem(77, 103, np.float32),
         compression=8, bigtiff=True, rows_per_strip=20)
    save('dem_be_packbits_u16', synth_dem(64, 80, np.uint16),
         compression=32773, byteorder='>', rows_per_strip=8)
    rgb = np.stack([synth_dem(60, 70, np.int32, seed=s) % 256
                    for s in range(3)], axis=-1).astype(np.uint8)
    save('rgb_3band_u8', rgb, compression=1, rows_per_strip=60)
    two = np.stack([synth_dem(50, 66, np.int16, seed=s)
                    for s in (4, 5)], axis=-1).astype(np.int16)
    save('dem_planar_deflate_i16', two, compression=8, planar=2,
         rows_per_strip=25)


if __name__ == '__main__':
    sys.exit(main())
