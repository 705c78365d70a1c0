import numpy as np
import pyarrow as pa
import pytest

from skyway_ray.fixtures import (
    make_images, make_boundaries, make_osm_elements,
    HOT_LAT, HOT_LON,
)
from skyway_ray.functions.image_codec import (
    encode_image, decode_image, encode_png, decode_png, psnr,
)
from skyway_ray.geo.geotag import latlon_from_phash, phash_from_latlon


class TestImageCodec:
    def test_png_roundtrip_exact(self):
        img = np.random.default_rng(1).integers(0, 256, (33, 17, 3), dtype=np.uint8)
        assert (decode_png(encode_png(img)) == img).all()

    def test_fake_lossy_psnr(self):
        img = np.random.default_rng(2).integers(0, 256, (32, 32, 3), dtype=np.uint8)
        for fmt in ("jpeg", "webp"):
            out = decode_image(encode_image(img, fmt), fmt)
            assert psnr(img, out) >= 40.0

    def test_real_jpeg_raises(self):
        with pytest.raises(NotImplementedError):
            decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 100, "jpeg")

    def test_deterministic(self):
        img = np.random.default_rng(3).integers(0, 256, (16, 16, 3), dtype=np.uint8)
        assert encode_image(img, "png") == encode_image(img, "png")
        assert encode_image(img, "jpeg") == encode_image(img, "jpeg")


class TestGeotag:
    def test_ranges(self):
        rng = np.random.default_rng(7)
        ph = rng.integers(0, 1 << 64, 10_000, dtype=np.uint64).view(np.int64)
        lat, lon = latlon_from_phash(ph)
        assert lat.min() >= -60 and lat.max() < 60
        assert lon.min() >= -180 and lon.max() < 180

    def test_inverse(self):
        lat = np.array([37.7, -12.3, 0.0, 59.9])
        lon = np.array([-122.4, 45.0, 0.0, 179.9])
        lat2, lon2 = latlon_from_phash(phash_from_latlon(lat, lon))
        assert np.allclose(lat, lat2, atol=1e-6)
        assert np.allclose(lon, lon2, atol=1e-6)


class TestFixtures:
    def test_images_deterministic_and_shaped(self):
        t1 = make_images(200)
        t2 = make_images(200)
        assert t1.equals(t2)
        assert t1.num_rows == 200
        assert t1.schema.names == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]

    def test_images_decode_invariant(self):
        t = make_images(60)
        for i in range(60):
            img = decode_image(t["bytes"][i].as_py(), t["fmt"][i].as_py())
            assert img.shape == (t["h"][i].as_py(), t["w"][i].as_py(), 3)

    def test_skew_cluster(self):
        t = make_images(1000)
        lat, lon = latlon_from_phash(t["phash"].to_numpy())
        near = (np.abs(lat - HOT_LAT) < 2.5) & (np.abs(lon - HOT_LON) < 2.5)
        assert near.sum() >= 90  # ~10% skew rows land in the hot disc

    def test_dups(self):
        t = make_images(1000)
        ph = t["phash"].to_numpy()
        n_dup = len(ph) - len(np.unique(ph))
        assert 15 <= n_dup <= 30  # ~2%

    def test_boundaries(self):
        b = make_boundaries(50)
        assert b.num_rows == 50
        lat0 = np.array(b["ring_lat"][0].as_py())
        lon0 = np.array(b["ring_lon"][0].as_py())
        # hot region ring stays within 5 degrees of the hot center
        assert np.abs(lat0 - HOT_LAT).max() <= 5.01
        assert np.abs(lon0 - HOT_LON).max() <= 5.01
        assert make_boundaries(50).equals(b)

    def test_osm_elements(self):
        t = make_osm_elements(1000)
        types = t["type"].to_pylist()
        assert abs(types.count("node") - 700) < 5
        assert abs(types.count("way") - 200) < 5
        # ways have nodes, relations have members, nodes have lat/lon
        df = t.to_pandas()
        assert df[df["type"] == "way"]["nodes"].map(lambda x: x is not None and len(x) > 0).all()
        assert df[df["type"] == "relation"]["members"].map(lambda x: len(x) > 0).all()
        assert df[df["type"] == "node"]["lat"].notna().all()
        assert make_osm_elements(1000).equals(t)


class TestVideoCodec:
    def test_roundtrip_exact(self):
        import numpy as np

        from skyway_ray.functions.video_codec import (decode_video,
                                                      encode_video)

        rng = np.random.default_rng(3)
        frames = rng.integers(0, 256, (5, 12, 9, 3), dtype=np.uint8)
        out = decode_video(encode_video(frames))
        assert out.shape == frames.shape
        assert (out == frames).all()

    def test_real_codec_payload_raises(self):
        import pytest

        from skyway_ray.functions.video_codec import decode_video

        with pytest.raises(NotImplementedError):
            decode_video(b"\x00\x00\x00\x18ftypmp42fakeatom")

    def test_fixture_frames_match_generator(self):
        import numpy as np

        from skyway_ray.fixtures import _VIDEO_SIDE, _gen_pixels, make_videos
        from skyway_ray.functions.video_codec import decode_video

        tab = make_videos(3)
        frames = decode_video(tab["bytes"][1].as_py())
        want = np.stack([_gen_pixels(1 * 1000 + t, _VIDEO_SIDE)
                         for t in range(frames.shape[0])])
        assert (frames == want).all()
