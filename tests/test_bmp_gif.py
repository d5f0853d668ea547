"""Conformance tests for the pure-python GIF (gif.py) and BMP (bmp.py)
codecs, against the same independent oracle test_jpeg.py uses: Java's
javax.imageio (ships with the JVM Spark runs on).

Direction A: our bitstreams must decode pixel-exactly in ImageIO (both
formats are lossless for <=256-color / arbitrary RGB input respectively).
Direction B: ImageIO-written bitstreams — including interlaced GIFs, which
exercise the four-pass row order — must decode pixel-exactly in ours.
"""

from __future__ import annotations

import shutil
import struct
import subprocess

import numpy as np
import pytest

from my_crawler_spark import bmp, gif

_JAVA_SRC = """
import java.awt.image.*;
import java.io.*;
import java.util.*;
import javax.imageio.*;
import javax.imageio.stream.*;

public class PCodec {
    static int[][] readPpm(String path) throws Exception {
        DataInputStream in = new DataInputStream(
            new BufferedInputStream(new FileInputStream(path)));
        int[] tok = new int[3];
        int got = 0; int cur = -1; boolean inTok = false; int b;
        in.read(); in.read();
        while (got < 3) {
            b = in.read();
            if (b >= '0' && b <= '9') { cur = (cur < 0 ? 0 : cur) * 10 + (b - '0'); inTok = true; }
            else if (inTok) { tok[got++] = cur; cur = -1; inTok = false; }
        }
        int w = tok[0], h = tok[1];
        int[][] px = new int[h][w];
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int r = in.read(), g = in.read(), bl = in.read();
                px[y][x] = (r << 16) | (g << 8) | bl;
            }
        in.close();
        return px;
    }

    static void writePpm(BufferedImage img, String path) throws Exception {
        int w = img.getWidth(), h = img.getHeight();
        DataOutputStream out = new DataOutputStream(
            new BufferedOutputStream(new FileOutputStream(path)));
        out.writeBytes("P6\\n" + w + " " + h + "\\n255\\n");
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) {
                int p = img.getRGB(x, y);
                out.write((p >> 16) & 0xFF);
                out.write((p >> 8) & 0xFF);
                out.write(p & 0xFF);
            }
        out.close();
    }

    public static void main(String[] a) throws Exception {
        if (a[0].equals("decode")) {
            BufferedImage img = ImageIO.read(new File(a[1]));
            if (img == null) throw new IOException("imageio failed to decode");
            writePpm(img, a[2]);
            return;
        }
        int[][] px = readPpm(a[1]);
        int h = px.length, w = px[0].length;
        if (a[0].equals("encodebmp")) {
            BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB);
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++) img.setRGB(x, y, px[y][x]);
            ImageIO.write(img, "bmp", new File(a[2]));
            return;
        }
        // encodegif / encodegifi: exact palette via IndexColorModel
        LinkedHashMap<Integer, Integer> palette = new LinkedHashMap<>();
        for (int[] row : px) for (int p : row)
            if (!palette.containsKey(p)) palette.put(p, palette.size());
        if (palette.size() > 256) throw new IOException("too many colors");
        int n = palette.size();
        byte[] r = new byte[n], g = new byte[n], bl = new byte[n];
        for (Map.Entry<Integer, Integer> e : palette.entrySet()) {
            int p = e.getKey(), i = e.getValue();
            r[i] = (byte)((p >> 16) & 0xFF); g[i] = (byte)((p >> 8) & 0xFF); bl[i] = (byte)(p & 0xFF);
        }
        IndexColorModel cm = new IndexColorModel(8, n, r, g, bl);
        BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm);
        WritableRaster ras = img.getRaster();
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++) ras.setSample(x, y, 0, palette.get(px[y][x]));
        ImageWriter wr = ImageIO.getImageWritersByFormatName("gif").next();
        ImageWriteParam p = wr.getDefaultWriteParam();
        p.setProgressiveMode(a[0].equals("encodegifi")
            ? ImageWriteParam.MODE_DEFAULT       // interlaced
            : ImageWriteParam.MODE_DISABLED);    // sequential rows
        ImageOutputStream os = ImageIO.createImageOutputStream(new File(a[2]));
        wr.setOutput(os);
        wr.write(null, new IIOImage(img, null, null), p);
        os.close();
    }
}
"""


@pytest.fixture(scope="session")
def pcodec(tmp_path_factory):
    if shutil.which("javac") is None or shutil.which("java") is None:
        pytest.skip("no JDK in environment")
    d = tmp_path_factory.mktemp("pcodec")
    (d / "PCodec.java").write_text(_JAVA_SRC)
    subprocess.run(["javac", "PCodec.java"], cwd=d, check=True, capture_output=True)

    def run(mode, src, dst):
        subprocess.run(
            ["java", "-cp", str(d), "PCodec", mode, str(src), str(dst)],
            check=True, capture_output=True,
        )

    return run


def _ppm_write(path, px):
    h, w, _ = px.shape
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(px.tobytes())


def _ppm_read(path):
    with open(path, "rb") as f:
        assert f.readline().strip() == b"P6"
        w, h = map(int, f.readline().split())
        assert f.readline().strip() == b"255"
        return np.frombuffer(f.read(), np.uint8).reshape(h, w, 3)


def _paletted(seed, h, w, n_colors):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    return pal[rng.integers(0, n_colors, (h, w))]


def test_bmp_ours_to_imageio(pcodec, tmp_path):
    px = np.random.default_rng(1).integers(0, 256, (33, 47, 3), dtype=np.uint8)
    (tmp_path / "a.bmp").write_bytes(bmp.encode_bmp(px))
    pcodec("decode", tmp_path / "a.bmp", tmp_path / "a.ppm")
    assert np.array_equal(_ppm_read(tmp_path / "a.ppm"), px)


def test_bmp_imageio_to_ours(pcodec, tmp_path):
    px = np.random.default_rng(2).integers(0, 256, (21, 30, 3), dtype=np.uint8)
    _ppm_write(tmp_path / "b.ppm", px)
    pcodec("encodebmp", tmp_path / "b.ppm", tmp_path / "b.bmp")
    assert np.array_equal(bmp.decode_bmp((tmp_path / "b.bmp").read_bytes()), px)


@pytest.mark.parametrize("n_colors", [2, 7, 256])
def test_gif_ours_to_imageio(pcodec, tmp_path, n_colors):
    px = _paletted(10 + n_colors, 40, 56, n_colors)
    (tmp_path / "a.gif").write_bytes(gif.encode_gif(px))
    pcodec("decode", tmp_path / "a.gif", tmp_path / "a.ppm")
    assert np.array_equal(_ppm_read(tmp_path / "a.ppm"), px)


@pytest.mark.parametrize("mode", ["encodegif", "encodegifi"])
def test_gif_imageio_to_ours(pcodec, tmp_path, mode):
    """Plain and INTERLACED ImageIO bitstreams decode exactly (the
    interlaced case drives the four-pass row reordering)."""
    px = _paletted(77, 37, 29, 101)  # odd dims cross pass boundaries
    _ppm_write(tmp_path / "c.ppm", px)
    pcodec(mode, tmp_path / "c.ppm", tmp_path / "c.gif")
    data = (tmp_path / "c.gif").read_bytes()
    # bit 6 of the image-descriptor packed byte: set iff interlaced mode —
    # guards both tests against ImageIO silently ignoring the param
    pos = 13
    if data[10] & 0x80:
        pos += 3 * (2 << (data[10] & 0x07))  # skip GCT
    while data[pos] == 0x21:  # skip extensions to the image descriptor
        pos += 2
        _, pos = gif._sub_blocks(data, pos)
    assert data[pos] == 0x2C
    interlaced = bool(data[pos + 9] & 0x40)
    assert interlaced == (mode == "encodegifi"), "progressive param ignored"
    assert np.array_equal(gif.decode_gif(data), px)


def test_gif_large_forces_code_width_growth_and_clear(pcodec, tmp_path):
    """Enough distinct LZW strings to walk code width 9->12 and trip the
    4096 dictionary reset — then ImageIO must still agree byte-for-byte."""
    px = _paletted(5, 128, 160, 256)
    data = gif.encode_gif(px)
    assert np.array_equal(gif.decode_gif(data), px)
    (tmp_path / "g.gif").write_bytes(data)
    pcodec("decode", tmp_path / "g.gif", tmp_path / "g.ppm")
    assert np.array_equal(_ppm_read(tmp_path / "g.ppm"), px)


def test_gif_transparency_composites_over_canvas():
    """A second frame with a transparent index must keep frame-1 pixels
    visible through the holes (hand-built bitstream, decode-only path)."""
    pal = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250], [9, 9, 9]], np.uint8)
    f1 = np.zeros((4, 4), np.uint8)  # all red
    f2 = np.full((4, 4), 3, np.uint8)  # index 3 = transparent
    f2[1:3, 1:3] = 1  # green center
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0)
    out += pal.tobytes()
    for idx, trans in ((f1, None), (f2, 3)):
        flags = 0x01 if trans is not None else 0x00
        out += b"\x21\xf9\x04" + struct.pack("<BHB", flags, 4, trans or 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0)
        out.append(2)
        lzw = gif._lzw_encode(idx.reshape(-1), 2)
        out.append(len(lzw))
        out += lzw
        out.append(0)
    out += b"\x3b"
    frames = gif.decode_gif_frames(bytes(out))
    assert len(frames) == 2
    expect = np.tile(pal[0], (4, 4, 1))
    assert np.array_equal(frames[0][1], expect)
    expect2 = expect.copy()
    expect2[1:3, 1:3] = pal[1]
    assert np.array_equal(frames[1][1], expect2)  # red shows through


def test_gif_encode_rejects_too_many_colors():
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert len(np.unique(px.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError):
        gif.encode_gif(px)


def test_bmp_top_down_and_32bit_and_palette():
    """Variants ImageIO does not emit but the wild does: negative height
    (top-down), 32-bit BGRA, 8-bit palettized."""
    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    data = bytearray(bmp.encode_bmp(px))
    # flip to top-down: negate height, rewrite rows in file order
    stride = (5 * 3 + 3) & ~3
    rows = np.zeros((6, stride), np.uint8)
    rows[:, : 5 * 3] = px[:, :, ::-1].reshape(6, 15)  # natural order, BGR
    data[22:26] = struct.pack("<i", -6)
    data[54:] = rows.tobytes()
    assert np.array_equal(bmp.decode_bmp(bytes(data)), px)

    # 32-bit BGRA, bottom-up
    raw32 = np.zeros((6, 5, 4), np.uint8)
    raw32[:, :, :3] = px[::-1, :, ::-1]
    raw32[:, :, 3] = 255
    hdr = struct.pack("<2sIHHI", b"BM", 54 + raw32.size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 5, 6, 1, 32, 0, raw32.size, 0, 0, 0, 0)
    assert np.array_equal(bmp.decode_bmp(hdr + info + raw32.tobytes()), px)

    # 8-bit palettized
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (6, 5), dtype=np.uint8)
    stride8 = (5 + 3) & ~3
    rows8 = np.zeros((6, stride8), np.uint8)
    rows8[:, :5] = idx[::-1]
    pal_bgrx = np.zeros((16, 4), np.uint8)
    pal_bgrx[:, :3] = pal[:, ::-1]
    off = 14 + 40 + 64
    hdr = struct.pack("<2sIHHI", b"BM", off + rows8.size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, 5, 6, 1, 8, 0, rows8.size, 0, 0, 16, 0)
    got = bmp.decode_bmp(hdr + info + pal_bgrx.tobytes() + rows8.tobytes())
    assert np.array_equal(got, pal[idx])


def test_gif_info_header_only_matches_full_decode():
    pal = _paletted(9, 10, 12, 30)
    frames = [np.roll(pal, i, axis=1) for i in range(5)]
    data = gif.encode_gif_frames(frames, delay_cs=8)
    n, total_cs, w, h = gif.gif_info(data)
    assert (n, total_cs, w, h) == (5, 40, 12, 10)
    assert len(gif.decode_gif_frames(data)) == 5
