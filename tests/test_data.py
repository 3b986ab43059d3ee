"""Data layer tests (mirrors reference test strategy, tests/test_data.py)."""

import json

import numpy as np
import pytest

from pgica_tpu.data import (
    CaptionTokenizer,
    ConceptualCaptionsDataset,
    DataLoader,
    ImageProcessor,
    TextProcessor,
    UltraFeedbackDataset,
    create_dataloaders,
)


@pytest.fixture
def image_processor():
    return ImageProcessor(image_size=32, augment=False)


@pytest.fixture
def text_processor():
    return TextProcessor(max_length=16)


# ---------------------------------------------------------------- tokenizer


class TestCaptionTokenizer:
    def test_roundtrip_byte_fallback(self):
        tok = CaptionTokenizer()
        text = "a red bird sitting on a branch"
        assert tok.decode(tok.encode(text)) == text

    def test_unicode_roundtrip(self):
        tok = CaptionTokenizer()
        text = "café ☕ naïve"
        assert tok.decode(tok.encode(text)) == text

    def test_special_token_ids_distinct(self):
        tok = CaptionTokenizer()
        ids = {tok.pad_token_id, tok.unk_token_id, tok.bos_token_id, tok.eos_token_id, tok.sep_token_id}
        assert len(ids) == 5

    def test_bos_eos(self):
        tok = CaptionTokenizer()
        ids = tok.encode("hi", add_bos=True, add_eos=True)
        assert ids[0] == tok.bos_token_id and ids[-1] == tok.eos_token_id

    def test_padded_encoding(self):
        tok = CaptionTokenizer()
        ids, mask = tok.encode_padded("hello world", max_length=32)
        assert ids.shape == (32,) and mask.shape == (32,)
        assert mask.sum() < 32
        assert (ids[mask.sum():] == tok.pad_token_id).all()
        assert ids[mask.sum() - 1] == tok.eos_token_id

    def test_truncation_keeps_eos(self):
        tok = CaptionTokenizer()
        ids, mask = tok.encode_padded("a" * 500, max_length=8)
        assert mask.sum() == 8
        assert ids[7] == tok.eos_token_id

    def test_train_bpe_merges_and_roundtrip(self):
        corpus = ["the cat sat on the mat"] * 20 + ["the dog ran in the park"] * 20
        tok = CaptionTokenizer.train_bpe(corpus, vocab_size=300)
        assert tok.vocab_size > 256 + 5  # learned at least one merge
        text = "the cat ran in the park"
        assert tok.decode(tok.encode(text)) == text
        # fewer tokens than raw bytes thanks to merges
        assert len(tok.encode(text)) < len(text.encode())

    def test_save_load(self, tmp_path):
        corpus = ["hello world"] * 10
        tok = CaptionTokenizer.train_bpe(corpus, vocab_size=280)
        tok.save(tmp_path)
        tok2 = CaptionTokenizer.load(tmp_path)
        assert tok2.encode("hello world") == tok.encode("hello world")
        assert tok2.vocab_size == tok.vocab_size


# ---------------------------------------------------------------- image processor


class TestImageProcessor:
    def test_process_from_path(self, temp_dataset_dir, image_processor):
        img = image_processor.process_image(temp_dataset_dir / "images" / "img_0.jpg")
        assert img.shape == (32, 32, 3)
        assert img.dtype == np.float32

    def test_resize(self, rng, image_processor):
        big = rng.integers(0, 255, (64, 48, 3), dtype=np.uint8)
        from PIL import Image

        out = image_processor.process_image(Image.fromarray(big))
        assert out.shape == (32, 32, 3)

    def test_denormalize_range(self, temp_dataset_dir, image_processor):
        img = image_processor.process_image(temp_dataset_dir / "images" / "img_1.jpg")
        den = image_processor.denormalize(img)
        assert den.min() >= 0.0 and den.max() <= 1.0

    def test_invalid_input_raises(self, image_processor):
        with pytest.raises(ValueError):
            image_processor.process_image(12345)

    def test_batch(self, temp_dataset_dir, image_processor):
        paths = [temp_dataset_dir / "images" / f"img_{i}.jpg" for i in range(3)]
        out = image_processor.process_batch(paths)
        assert out.shape == (3, 32, 32, 3)


# ---------------------------------------------------------------- text processor


class TestTextProcessor:
    def test_encode_caption(self, text_processor):
        enc = text_processor.encode_caption("a dog in the park")
        assert enc["input_ids"].shape == (16,)
        assert enc["attention_mask"].shape == (16,)

    def test_roundtrip(self, text_processor):
        enc = text_processor.encode_caption("hello there")
        assert text_processor.decode_caption(enc["input_ids"]) == "hello there"

    def test_batch(self, text_processor):
        enc = text_processor.encode_batch(["one", "two two"])
        assert enc["input_ids"].shape == (2, 16)
        decoded = text_processor.decode_batch(enc["input_ids"])
        assert decoded == ["one", "two two"]

    def test_non_string_raises(self, text_processor):
        with pytest.raises(ValueError):
            text_processor.encode_caption(42)

    def test_vocab_properties(self, text_processor):
        assert text_processor.vocab_size > 256
        assert text_processor.pad_token_id != text_processor.eos_token_id

    def test_prepare_for_generation(self, text_processor):
        out = text_processor.prepare_for_generation()
        assert out["input_ids"][0, 0] == text_processor.bos_token_id


# ---------------------------------------------------------------- datasets


class TestConceptualCaptionsDataset:
    def test_json_loading(self, temp_dataset_dir, image_processor, text_processor):
        ds = ConceptualCaptionsDataset(temp_dataset_dir, image_processor, text_processor)
        assert len(ds) == 8
        item = ds[0]
        assert item["image"].shape == (32, 32, 3)
        assert item["caption_ids"].shape == (16,)
        assert isinstance(item["raw_caption"], str)

    def test_csv_loading(self, temp_dataset_dir, image_processor, text_processor, tmp_path):
        csv = tmp_path / "data.csv"
        rows = ["image_url,description"]
        for i in range(4):
            rows.append(f"{temp_dataset_dir}/images/img_{i}.jpg,caption number {i}")
        csv.write_text("\n".join(rows))
        ds = ConceptualCaptionsDataset(csv, image_processor, text_processor)
        assert len(ds) == 4
        assert ds[1]["raw_caption"] == "caption number 1"

    def test_directory_sidecar_mode(self, tmp_path, rng, image_processor, text_processor):
        from PIL import Image

        for i in range(3):
            arr = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
            Image.fromarray(arr).save(tmp_path / f"pic_{i}.png")
            (tmp_path / f"pic_{i}.txt").write_text(f"sidecar caption {i}")
        ds = ConceptualCaptionsDataset(tmp_path, image_processor, text_processor)
        assert len(ds) == 3

    def test_max_samples(self, temp_dataset_dir, image_processor, text_processor):
        ds = ConceptualCaptionsDataset(
            temp_dataset_dir, image_processor, text_processor, max_samples=3
        )
        assert len(ds) == 3

    def test_corrupt_image_fallback(self, temp_dataset_dir, image_processor, text_processor):
        bad = temp_dataset_dir / "images" / "img_0.jpg"
        bad.write_bytes(b"not an image at all")
        ds = ConceptualCaptionsDataset(temp_dataset_dir, image_processor, text_processor)
        item = ds.get_sample_by_path(str(bad))
        assert item is not None
        assert (item["image"] == 0).all()

    def test_empty_caption_filtered(self, temp_dataset_dir, image_processor, text_processor):
        ann = temp_dataset_dir / "annotations.json"
        records = json.loads(ann.read_text())
        records.append({"image_path": "images/img_0.jpg", "caption": "   "})
        ann.write_text(json.dumps(records))
        ds = ConceptualCaptionsDataset(temp_dataset_dir, image_processor, text_processor)
        assert len(ds) == 8

    def test_missing_path_raises(self, image_processor, text_processor, tmp_path):
        with pytest.raises(FileNotFoundError):
            ConceptualCaptionsDataset(tmp_path / "nope", image_processor, text_processor)

    def test_lookup_by_path(self, temp_dataset_dir, image_processor, text_processor):
        ds = ConceptualCaptionsDataset(temp_dataset_dir, image_processor, text_processor)
        assert ds.get_sample_by_path("img_2.jpg") is not None
        assert ds.get_sample_by_path("missing.jpg") is None


class TestUltraFeedbackDataset:
    def test_direct_format(self, temp_preference_dataset, image_processor, text_processor):
        ds = UltraFeedbackDataset(temp_preference_dataset, image_processor, text_processor)
        assert len(ds) == 6
        item = ds[0]
        assert item["preferred_ids"].shape == (16,)
        assert item["rejected_ids"].shape == (16,)
        assert item["image"].shape == (32, 32, 3)
        assert item["preference_score"] >= 0.6

    def test_conversations_format(self, tmp_path, temp_dataset_dir, image_processor, text_processor):
        img = str(temp_dataset_dir / "images" / "img_0.jpg")
        data = [
            {
                "image_path": img,
                "conversations": [
                    {"response": "excellent detailed caption", "score": 0.95},
                    {"response": "ok caption", "score": 0.2},
                    {"response": "bad", "score": 0.1},
                ],
            }
        ]
        p = tmp_path / "uf.json"
        p.write_text(json.dumps(data))
        ds = UltraFeedbackDataset(p, image_processor, text_processor, preference_threshold=0.6)
        # only the 0.95-0.2 adjacent pair passes the 0.6 threshold
        assert len(ds) == 1
        assert ds[0]["raw_preferred"] == "excellent detailed caption"

    def test_scored_captions_format(self, tmp_path, temp_dataset_dir, image_processor, text_processor):
        img = str(temp_dataset_dir / "images" / "img_1.jpg")
        data = [{"image_path": img, "captions": ["great", "poor"], "scores": [1.0, 0.1]}]
        p = tmp_path / "scored.json"
        p.write_text(json.dumps(data))
        ds = UltraFeedbackDataset(p, image_processor, text_processor)
        assert len(ds) == 1
        assert ds[0]["raw_preferred"] == "great"

    def test_threshold_filtering(self, tmp_path, temp_dataset_dir, image_processor, text_processor):
        img = str(temp_dataset_dir / "images" / "img_1.jpg")
        data = [
            {"image_path": img, "preferred_caption": "a", "rejected_caption": "b", "preference_score": 0.5},
            {"image_path": img, "preferred_caption": "c", "rejected_caption": "d", "preference_score": 0.9},
        ]
        p = tmp_path / "pairs.json"
        p.write_text(json.dumps(data))
        ds = UltraFeedbackDataset(p, image_processor, text_processor, preference_threshold=0.6)
        assert len(ds) == 1


# ---------------------------------------------------------------- dataloaders


class TestDataLoaders:
    def test_split_sizes(self, temp_dataset_dir, image_processor, text_processor):
        train, val, test = create_dataloaders(
            ConceptualCaptionsDataset,
            temp_dataset_dir,
            image_processor,
            text_processor,
            batch_size=2,
        )
        n = len(train.dataset) + len(val.dataset) + len(test.dataset)
        assert n == 8
        assert len(train.dataset) == 6

    def test_per_split_augment_flags(self, temp_dataset_dir, image_processor, text_processor):
        train, val, test = create_dataloaders(
            ConceptualCaptionsDataset, temp_dataset_dir, image_processor, text_processor, batch_size=2
        )
        assert train.dataset.augment is True
        assert val.dataset.augment is False and test.dataset.augment is False

    def test_batch_shapes(self, temp_dataset_dir, image_processor, text_processor):
        train, _, _ = create_dataloaders(
            ConceptualCaptionsDataset, temp_dataset_dir, image_processor, text_processor, batch_size=2
        )
        batch = next(iter(train))
        assert batch["image"].shape == (2, 32, 32, 3)
        assert batch["caption_ids"].shape == (2, 16)
        assert isinstance(batch["raw_caption"], list)

    def test_seed_reproducibility(self, temp_dataset_dir, image_processor, text_processor):
        def first_paths(seed):
            train, _, _ = create_dataloaders(
                ConceptualCaptionsDataset,
                temp_dataset_dir,
                image_processor,
                text_processor,
                batch_size=2,
                seed=seed,
            )
            return next(iter(train))["image_path"]

        assert first_paths(7) == first_paths(7)
        assert first_paths(7) != first_paths(8)

    def test_drop_last(self, temp_dataset_dir, image_processor, text_processor):
        ds = ConceptualCaptionsDataset(temp_dataset_dir, image_processor, text_processor)
        loader = DataLoader(ds, batch_size=3, drop_last=True)
        batches = list(loader)
        assert len(batches) == 2
        loader2 = DataLoader(ds, batch_size=3, drop_last=False)
        assert len(list(loader2)) == 3

    def test_bad_split_fractions(self, temp_dataset_dir, image_processor, text_processor):
        with pytest.raises(ValueError):
            create_dataloaders(
                ConceptualCaptionsDataset,
                temp_dataset_dir,
                image_processor,
                text_processor,
                train_split=0.5,
                val_split=0.1,
                test_split=0.1,
            )


# ---------------------------------------------------------------- device augmentation


class TestAugment:
    def test_augment_changes_images_and_is_deterministic(self, temp_dataset_dir, image_processor):
        import jax

        from pgica_tpu.data.augment import augment_batch

        batch = image_processor.process_batch(
            [temp_dataset_dir / "images" / f"img_{i}.jpg" for i in range(2)]
        )
        key = jax.random.PRNGKey(0)
        out1 = np.asarray(augment_batch(key, batch, enabled=True))
        out2 = np.asarray(augment_batch(key, batch, enabled=True))
        out3 = np.asarray(augment_batch(jax.random.PRNGKey(1), batch, enabled=True))
        assert out1.shape == batch.shape
        np.testing.assert_allclose(out1, out2)  # same key -> same augmentation
        assert not np.allclose(out1, out3)  # different key -> different
        assert np.isfinite(out1).all()

    def test_disabled_is_identity(self, temp_dataset_dir, image_processor):
        import jax

        from pgica_tpu.data.augment import augment_batch

        batch = image_processor.process_batch([temp_dataset_dir / "images" / "img_0.jpg"])
        out = np.asarray(augment_batch(jax.random.PRNGKey(0), batch, enabled=False))
        np.testing.assert_allclose(out, batch)


    def test_rotate_3shear_matches_direct_rotation(self, rng):
        """Paeth 3-shear rotation vs direct inverse-mapping nearest rotation:
        >=95% of pixels identical on a smooth image; zero angle = identity."""
        import jax.numpy as jnp

        from pgica_tpu.data.augment import rotate_3shear

        h = w = 48
        base = rng.random((h, w)).astype(np.float32)
        # smooth so rounding-boundary pixels are the only disagreements
        k = np.ones((5, 5)) / 25.0
        sm = base.copy()
        for _ in range(3):
            pad = np.pad(sm, 2, mode="edge")
            sm = sum(
                pad[i : i + h, j : j + w] * k[i, j] for i in range(5) for j in range(5)
            )
        img = np.repeat(sm[:, :, None], 3, axis=2).astype(np.float32)

        def direct(imgc, theta):
            cy, cx = (h - 1) / 2, (w - 1) / 2
            yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            c, s = np.cos(theta), np.sin(theta)
            ys = c * (yy - cy) + s * (xx - cx) + cy
            xs = -s * (yy - cy) + c * (xx - cx) + cx
            yi, xi = np.round(ys).astype(int), np.round(xs).astype(int)
            valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            out = np.zeros_like(imgc)
            out[valid] = imgc[np.clip(yi, 0, h - 1)[valid], np.clip(xi, 0, w - 1)[valid]]
            return out

        for deg in (5.0, -5.0, 3.2):
            theta = np.deg2rad(deg)
            got = np.asarray(rotate_3shear(jnp.asarray(img), jnp.float32(theta), 5.0))
            want = direct(img, theta)
            frac_equal = np.mean(np.abs(got - want) < 2e-2)
            assert frac_equal > 0.95, (deg, frac_equal)

        ident = np.asarray(rotate_3shear(jnp.asarray(img), jnp.float32(0.0), 5.0))
        np.testing.assert_allclose(ident, img, atol=1e-6)

    def test_rotate_batch_flip_conjugation_exact(self, rng):
        """_rotate_batch computes R(-theta) as Flip_W . R(theta) . Flip_W (one
        shared +theta pass = 3 matmuls). The conjugation must be BIT-exact vs
        running the -theta shears directly (jnp.round is half-to-even, which
        is odd-symmetric, so the negated shear shifts match exactly)."""
        import jax.numpy as jnp

        from pgica_tpu.data.augment import _rot3_batch

        imgs = jnp.asarray(rng.random((2, 24, 24, 3)).astype(np.float32))
        theta = jnp.float32(np.deg2rad(4.1))
        direct_neg = np.asarray(_rot3_batch(imgs, -theta))
        conj_neg = np.asarray(_rot3_batch(imgs[:, :, ::-1, :], theta))[:, :, ::-1, :]
        np.testing.assert_array_equal(conj_neg, direct_neg)

    def test_hsv_roundtrip_matches_colorsys(self, rng):
        """_rgb_to_hsv/_hsv_to_rgb implement the colorsys/torchvision
        convention exactly (true HSV hue rotation, reference
        preprocessing.py:61-66 ColorJitter(hue=0.1))."""
        import colorsys

        import jax.numpy as jnp

        from pgica_tpu.data.augment import _hsv_to_rgb, _rgb_to_hsv

        rgb = rng.random((64, 3)).astype(np.float32)
        hsv = np.asarray(_rgb_to_hsv(jnp.asarray(rgb)))
        want = np.asarray([colorsys.rgb_to_hsv(*p) for p in rgb], np.float32)
        np.testing.assert_allclose(hsv, want, atol=1e-5)
        back = np.asarray(_hsv_to_rgb(jnp.asarray(hsv)))
        np.testing.assert_allclose(back, rgb, atol=1e-5)

    def test_hue_rotation_matches_colorsys_reference(self, rng):
        """A hue shift through the batched path equals the per-pixel
        colorsys h+shift mod 1 reimplementation of torchvision adjust_hue."""
        import colorsys

        import jax.numpy as jnp

        from pgica_tpu.data.augment import _hsv_to_rgb, _rgb_to_hsv

        rgb = rng.random((5, 7, 3)).astype(np.float32)
        shift = 0.083
        hsv = _rgb_to_hsv(jnp.asarray(rgb))
        hsv = hsv.at[..., 0].set((hsv[..., 0] + shift) % 1.0)
        got = np.asarray(_hsv_to_rgb(hsv))
        want = np.empty_like(rgb)
        for i in range(rgb.shape[0]):
            for j in range(rgb.shape[1]):
                h, s, v = colorsys.rgb_to_hsv(*rgb[i, j])
                want[i, j] = colorsys.hsv_to_rgb((h + shift) % 1.0, s, v)
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestDeviceSideNormalization:
    def test_uint8_path_matches_host_normalization(self, temp_dataset_dir):
        from pgica_tpu.data.augment import prepare_images

        host = ImageProcessor(image_size=32)
        dev = ImageProcessor(image_size=32, device_side_normalization=True)
        path = temp_dataset_dir / "images" / "img_0.jpg"
        host_out = host.process_image(path)
        raw = dev.process_image(path)
        assert raw.dtype == np.uint8
        dev_out = np.asarray(prepare_images(raw[None]))[0]
        np.testing.assert_allclose(dev_out, host_out, atol=1e-5)

    def test_float_passthrough(self, rng):
        from pgica_tpu.data.augment import prepare_images

        x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(prepare_images(x)), x)

    def test_factory_wires_config_key(self, temp_dataset_dir):
        """data.device_side_normalization routes the uint8 wire format
        through create_processors (on by default in configs/default.yaml so
        the production eval path IS the benchmarked path)."""
        from pgica_tpu.utils.config import Config
        from pgica_tpu.utils.factories import create_processors
        import sys
        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
        from conftest import make_config_dict

        cfg = Config(config_dict=make_config_dict(
            **{"data.device_side_normalization": True, "data.image_size": 32}
        ))
        ip, _ = create_processors(cfg)
        assert ip.device_side_normalization
        out = ip.process_image(temp_dataset_dir / "images" / "img_0.jpg")
        assert out.dtype == np.uint8
        assert Config("configs/default.yaml").get("data.device_side_normalization") is True


class TestDatasetTrainedBPE:
    def test_factory_trains_and_caches_bpe(self, temp_dataset_dir, tmp_path):
        from pgica_tpu.utils.config import Config
        from pgica_tpu.utils.factories import create_tokenizer
        import sys
        sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))
        from conftest import make_config_dict

        cfg = Config(config_dict=make_config_dict(**{
            "data.conceptual_captions_path": str(temp_dataset_dir),
            "data.bpe_vocab_size": 300,
            "paths.cache_dir": str(tmp_path / "cache"),
        }))
        tok = create_tokenizer(cfg)
        assert tok.vocab_size > 256 + 5  # learned merges from the corpus
        assert tok.decode(tok.encode("a red bird")) == "a red bird"
        # second call loads from cache (same ids)
        tok2 = create_tokenizer(cfg)
        assert tok2.encode("two dogs playing") == tok.encode("two dogs playing")


class TestWorkerModes:
    """Intra-batch fetch fan-out: thread and process (fork) modes must agree."""

    def test_process_mode_matches_inline(self, temp_dataset_dir):
        from pgica_tpu.data.loader import ConceptualCaptionsDataset, DataLoader
        from pgica_tpu.data.preprocessing import ImageProcessor, TextProcessor

        ds = ConceptualCaptionsDataset(
            temp_dataset_dir, ImageProcessor(image_size=32), TextProcessor(max_length=16)
        )
        inline = DataLoader(ds, batch_size=4)
        proc = DataLoader(ds, batch_size=4, num_workers=2, workers_mode="process")
        try:
            for a, b in zip(inline, proc):
                np.testing.assert_array_equal(a["image"], b["image"])
                np.testing.assert_array_equal(a["caption_ids"], b["caption_ids"])
        finally:
            proc.close()

    @pytest.mark.slow
    def test_grain_mode_matches_inline(self, temp_dataset_dir):
        """grain spawns worker processes (picklable dataset) that fetch and
        collate whole batches; content must match the inline path exactly."""
        pytest.importorskip("grain")
        from pgica_tpu.data.loader import ConceptualCaptionsDataset, DataLoader
        from pgica_tpu.data.preprocessing import ImageProcessor, TextProcessor

        ds = ConceptualCaptionsDataset(
            temp_dataset_dir, ImageProcessor(image_size=32), TextProcessor(max_length=16)
        )
        inline = DataLoader(ds, batch_size=4, shuffle=True)
        grain_dl = DataLoader(
            ds, batch_size=4, shuffle=True, num_workers=2, workers_mode="grain"
        )
        try:
            # Two consecutive epochs: content matches the inline path exactly
            # (shuffled orders included) AND the spawned worker pool persists
            # across the epoch boundary (no per-epoch respawn).
            for epoch in range(2):
                got = list(grain_dl)
                want = list(inline)
                assert len(got) == len(want)
                for a, b in zip(want, got):
                    np.testing.assert_array_equal(a["image"], b["image"])
                    np.testing.assert_array_equal(a["caption_ids"], b["caption_ids"])
                    assert a["raw_caption"] == b["raw_caption"]
                if epoch == 0:
                    pool = grain_dl._grain_dl
                else:
                    assert grain_dl._grain_dl is pool, "grain pool respawned per epoch"

            # Mid-epoch resume: a non-contiguous request repositions via the
            # source's base offset and replays the pinned tail exactly.
            inline.set_epoch(5)
            grain_dl.set_epoch(5)
            want_tail = list(inline.iter_batches(1))
            got_tail = list(grain_dl.iter_batches(1))
            assert grain_dl._grain_dl is not pool, "resume should rebuild positioned pool"
            assert len(got_tail) == len(want_tail) > 0
            for a, b in zip(want_tail, got_tail):
                np.testing.assert_array_equal(a["image"], b["image"])
                assert a["raw_caption"] == b["raw_caption"]
        finally:
            grain_dl.close()


class TestIterBatches:
    """O(1) mid-epoch resume: iter_batches(start) must replay the pinned
    epoch order from `start` WITHOUT fetching the consumed prefix."""

    class _Counting:
        def __init__(self, ds):
            self.ds = ds
            self.calls = []

        def __len__(self):
            return len(self.ds)

        def __getitem__(self, i):
            self.calls.append(i)
            return self.ds[i]

    def test_tail_matches_and_prefix_not_fetched(self, temp_dataset_dir):
        from pgica_tpu.data.loader import ConceptualCaptionsDataset, DataLoader
        from pgica_tpu.data.preprocessing import ImageProcessor, TextProcessor

        ds = ConceptualCaptionsDataset(
            temp_dataset_dir, ImageProcessor(image_size=32), TextProcessor(max_length=16)
        )
        proxy = self._Counting(ds)
        dl = DataLoader(proxy, batch_size=2, shuffle=True, seed=7, prefetch=0)
        dl.set_epoch(3)
        full = list(dl)
        assert len(full) >= 3
        proxy.calls = []
        dl.set_epoch(3)  # same pinned order
        tail = list(dl.iter_batches(2))
        assert len(tail) == len(full) - 2
        for a, b in zip(full[2:], tail):
            np.testing.assert_array_equal(a["image"], b["image"])
            np.testing.assert_array_equal(a["caption_ids"], b["caption_ids"])
        fetched = len(proxy.calls)
        expected = sum(b["image"].shape[0] for b in tail)
        assert fetched == expected, "consumed prefix was fetched on resume"


class TestExactUnicodePretokenizer:
    """GPT-2 \\p{L}/\\p{N} classes are exact (generated Unicode tables), not
    the round-1 'every non-ASCII codepoint is a letter' approximation."""

    def test_superscript_is_number_not_letter(self):
        from pgica_tpu.data.tokenizer import _pretokenize

        assert _pretokenize("x²") == ["x", "²"]

    def test_arrow_is_punctuation(self):
        from pgica_tpu.data.tokenizer import _pretokenize

        assert _pretokenize("a → b") == ["a", " →", " b"]

    def test_arabic_digits_group_as_numbers(self):
        from pgica_tpu.data.tokenizer import _pretokenize

        assert _pretokenize("١٢٣x") == ["١٢٣", "x"]

    def test_nbsp_is_whitespace(self):
        from pgica_tpu.data.tokenizer import _pretokenize

        # U+00A0 matches \s, so it prefixes... no — only ASCII space prefixes
        # word tokens in GPT-2's ` ?` — NBSP stays a whitespace token.
        assert _pretokenize("a b") == ["a", " ", "b"]


@pytest.mark.slow
def test_grain_concurrent_iterations_independent(temp_dataset_dir):
    """Two interleaved iterations of one grain loader must not corrupt each
    other: the second runs on an independent one-shot pipeline while the
    first owns the persistent pool."""
    pytest.importorskip("grain")
    from pgica_tpu.data.loader import ConceptualCaptionsDataset, DataLoader
    from pgica_tpu.data.preprocessing import ImageProcessor, TextProcessor

    ds = ConceptualCaptionsDataset(
        temp_dataset_dir, ImageProcessor(image_size=32), TextProcessor(max_length=16)
    )
    inline = DataLoader(ds, batch_size=4)
    g = DataLoader(ds, batch_size=4, num_workers=2, workers_mode="grain")
    try:
        want = list(inline)
        it1, it2 = iter(g), iter(g)
        a1 = next(it1)           # it1 owns the persistent pool
        b = list(it2)            # concurrent full epoch via one-shot pipeline
        a = [a1] + list(it1)     # finish the first iteration
        for got in (a, b):
            assert len(got) == len(want)
            for x, y in zip(want, got):
                np.testing.assert_array_equal(x["image"], y["image"])
    finally:
        g.close()
