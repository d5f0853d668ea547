"""Conformance tests for the pure-numpy baseline JPEG codec (jpeg.py).

The independent oracle is Java's javax.imageio (the JVM ships with Spark,
so it is always present in this environment): a conformant third-party
codec that (a) must decode our bitstream to the same pixels our decoder
produces, and (b) produces bitstreams — including 4:2:0-subsampled and
grayscale ones — our decoder must read.
"""

from __future__ import annotations

import shutil
import subprocess

import numpy as np
import pytest

from my_crawler_spark.codecs import psnr
from my_crawler_spark.fixtures import make_pixels
from my_crawler_spark.jpeg import decode_jpeg, encode_jpeg

_JAVA_SRC = """
import java.awt.image.BufferedImage;
import java.io.*;
import javax.imageio.*;
import javax.imageio.stream.*;

public class JCodec {
    public static void main(String[] a) throws Exception {
        if (a[0].equals("decode")) {
            BufferedImage img = ImageIO.read(new File(a[1]));
            if (img == null) throw new IOException("imageio failed to decode");
            int w = img.getWidth(), h = img.getHeight();
            boolean gray = img.getRaster().getNumBands() == 1;
            DataOutputStream out = new DataOutputStream(
                new BufferedOutputStream(new FileOutputStream(a[2])));
            out.writeBytes("P6\\n" + w + " " + h + "\\n255\\n");
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++) {
                    if (gray) {
                        // raw Y' sample, replicated: getRGB on a gray
                        // raster applies a linear-light colorspace
                        // conversion that is NOT part of the JPEG codec
                        int s = img.getRaster().getSample(x, y, 0);
                        out.write(s); out.write(s); out.write(s);
                    } else {
                        int p = img.getRGB(x, y);
                        out.write((p >> 16) & 0xFF);
                        out.write((p >> 8) & 0xFF);
                        out.write(p & 0xFF);
                    }
                }
            out.close();
        } else {
            DataInputStream in = new DataInputStream(
                new BufferedInputStream(new FileInputStream(a[1])));
            int[] tok = new int[3];
            int got = 0; int cur = -1; boolean inTok = false; int b;
            in.read(); in.read();
            while (got < 3) {
                b = in.read();
                if (b >= '0' && b <= '9') { cur = (cur < 0 ? 0 : cur) * 10 + (b - '0'); inTok = true; }
                else if (inTok) { tok[got++] = cur; cur = -1; inTok = false; }
            }
            int w = tok[0], h = tok[1];
            boolean gray = a[0].equals("encodegray");
            BufferedImage img = new BufferedImage(
                w, h, gray ? BufferedImage.TYPE_BYTE_GRAY : BufferedImage.TYPE_INT_RGB);
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++) {
                    int r = in.read(), g = in.read(), bl = in.read();
                    img.setRGB(x, y, (r << 16) | (g << 8) | bl);
                }
            in.close();
            ImageWriter wr = ImageIO.getImageWritersByFormatName("jpeg").next();
            ImageWriteParam p = wr.getDefaultWriteParam();
            p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
            p.setCompressionQuality(Float.parseFloat(a[3]));
            ImageOutputStream os = ImageIO.createImageOutputStream(new File(a[2]));
            wr.setOutput(os);
            wr.write(null, new IIOImage(img, null, null), p);
            os.close();
        }
    }
}
"""


@pytest.fixture(scope="session")
def jcodec(tmp_path_factory):
    if shutil.which("javac") is None or shutil.which("java") is None:
        pytest.skip("no JDK in environment")
    d = tmp_path_factory.mktemp("jcodec")
    (d / "JCodec.java").write_text(_JAVA_SRC)
    subprocess.run(
        ["javac", "JCodec.java"], cwd=d, check=True, capture_output=True
    )

    def run(mode, src, dst, quality=None):
        args = ["java", "-cp", str(d), "JCodec", mode, str(src), str(dst)]
        if quality is not None:
            args.append(str(quality))
        subprocess.run(args, check=True, capture_output=True)

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


def test_roundtrip_q98_over_40db_fixture_content():
    for i in range(8):
        px = make_pixels(42, i, 24, 24)
        back = decode_jpeg(encode_jpeg(px, quality=98))
        assert back.shape == px.shape
        assert psnr(px, back) >= 40.0


def test_roundtrip_non_multiple_of_8_shapes():
    for h, w in [(8, 8), (17, 9), (50, 70), (1, 1), (3, 200)]:
        px = make_pixels(42, h * 1000 + w, w, h)
        back = decode_jpeg(encode_jpeg(px, quality=95))
        assert back.shape == (h, w, 3)
        assert psnr(px, back) >= 30.0, (h, w)


def test_restart_markers_roundtrip():
    px = make_pixels(42, 5, 64, 48)  # 48 MCUs at 4:4:4
    plain = encode_jpeg(px, quality=95)
    rst = encode_jpeg(px, quality=95, restart_interval=5)
    assert b"\xff\xdd" in rst and b"\xff\xdd" not in plain
    # decoded pixels identical: restarts change framing, not content
    assert np.array_equal(decode_jpeg(rst), decode_jpeg(plain))


def test_quality_monotone_in_size():
    px = make_pixels(42, 11, 32, 32)
    sizes = [len(encode_jpeg(px, q)) for q in (50, 75, 92, 98)]
    assert sizes == sorted(sizes)


def test_java_decodes_our_bitstream(jcodec, tmp_path):
    """Spec conformance of the ENCODER: an independent decoder must agree
    with our own decoder nearly exactly (residual = IDCT rounding)."""
    px = make_pixels(42, 3, 64, 48)
    jpg = tmp_path / "mine.jpg"
    jpg.write_bytes(encode_jpeg(px, quality=95, restart_interval=7))
    out = tmp_path / "jdec.ppm"
    jcodec("decode", jpg, out)
    theirs = _ppm_read(out)
    ours = decode_jpeg(jpg.read_bytes())
    assert theirs.shape == ours.shape
    assert psnr(ours, theirs) >= 45.0  # same bitstream, same pixels
    assert psnr(px, theirs) >= 35.0


def test_we_decode_java_bitstream_444_and_420(jcodec, tmp_path):
    """Spec conformance of the DECODER: read javax.imageio's output at
    high quality (4:4:4-ish) and low quality (4:2:0 subsampled)."""
    px = make_pixels(42, 9, 64, 48)
    ppm = tmp_path / "orig.ppm"
    _ppm_write(ppm, px)
    for q, floor in ((0.9, 26.0), (0.4, 22.0)):
        jpg = tmp_path / f"java_{q}.jpg"
        jcodec("encode", ppm, jpg, q)
        ours = decode_jpeg(jpg.read_bytes())
        assert ours.shape == px.shape
        out = tmp_path / f"jdec_{q}.ppm"
        jcodec("decode", jpg, out)
        theirs = _ppm_read(out)
        # same bitstream, two independent decoders: near-exact agreement
        # (triangle chroma upsampling matches libjpeg/imageio behavior)
        assert psnr(ours, theirs) >= 45.0
        assert psnr(px, ours) >= floor

def test_we_decode_java_grayscale(jcodec, tmp_path):
    """1-component scan path: Java writes a true grayscale JPEG (after its
    own sRGB->linear-gray conversion, which is colorspace, not codec — so
    the comparison is our decode vs JAVA's raw-sample decode of the SAME
    bitstream, not vs the pre-conversion original)."""
    g = make_pixels(42, 21, 40, 40)[:, :, :1].repeat(3, axis=2)
    ppm = tmp_path / "gray.ppm"
    _ppm_write(ppm, g)
    jpg = tmp_path / "gray.jpg"
    jcodec("encodegray", ppm, jpg, 0.9)
    ours = decode_jpeg(jpg.read_bytes())
    assert ours.shape == g.shape
    out = tmp_path / "gray_jdec.ppm"
    jcodec("decode", jpg, out)
    theirs = _ppm_read(out)
    assert psnr(ours, theirs) >= 45.0


def test_progressive_rejected():
    # minimal SOF2 frame header after SOI -> explicit baseline-only error
    data = b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(data)
