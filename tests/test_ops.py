"""Device-op tests: losses (goldens vs torch semantics), streaming metrics
(vs sklearn), augmentation, retrieval metrics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlp_tpu.ops import losses
from vlp_tpu.ops.augment import AugmentConfig, augment_and_normalize, normalize_only
from vlp_tpu.ops.metrics import (
    auroc_exact,
    binary_report,
    compute_metrics,
    init_state,
    merge_states,
    update_state,
)
from vlp_tpu.ops.retrieval import image_text_recall_at_k, label_precision_at_k


class TestBCE:
    def test_matches_weighted_mean_semantics(self):
        # Golden: independent float64 numpy implementation of torch
        # BCEWithLogitsLoss(weight=w, reduction='mean') = mean(w * bce)
        rng = np.random.default_rng(0)
        logits = rng.normal(size=16).astype(np.float32)
        labels = (rng.random(16) < 0.5).astype(np.float32)
        w = losses.per_sample_class_weights(jnp.array(labels), (0.8, 1.3))
        ours = losses.bce_with_logits(jnp.array(logits), jnp.array(labels), w)
        x, y = logits.astype(np.float64), labels.astype(np.float64)
        per = np.maximum(x, 0) - x * y + np.log1p(np.exp(-np.abs(x)))
        wn = y * 1.3 + (1 - y) * 0.8
        ref = (wn * per).mean()
        assert abs(float(ours) - float(ref)) < 1e-4  # fp32 vs fp64 golden

    def test_mask_excludes_padding(self):
        logits = jnp.array([0.5, -1.0, 99.0])
        labels = jnp.array([1.0, 0.0, 0.0])
        mask = jnp.array([1.0, 1.0, 0.0])
        full = losses.bce_with_logits(logits[:2], labels[:2])
        masked = losses.bce_with_logits(logits, labels, mask=mask)
        assert abs(float(full) - float(masked)) < 1e-6


class TestCoral:
    def test_matches_reference_examples(self):
        # Reference __main__ cases (coral.py:39-50). Golden: float64 numpy
        # CORAL with Bessel-corrected covariance.
        def np_coral(s, t):
            def cov(x):
                n = x.shape[0]
                mean = x.mean(0, keepdims=True)
                return (x.T @ x - n * mean.T @ mean) / (n - 1)

            d = s.shape[1]
            return ((cov(s) - cov(t)) ** 2).sum() / (4 * d * d)

        src = np.array([[1.0], [1.0], [1.1], [0.9]])
        for tgt in (np.array([[10.0], [10.0], [11.0]]),
                    np.array([[1.0], [1.0], [1.1]])):
            ours = losses.coral_loss(jnp.array(src), jnp.array(tgt))
            assert abs(float(ours) - np_coral(src, tgt)) < 1e-5
        # the 1-elem-covariance example: two clusters far apart
        big = losses.coral_loss(jnp.array(src),
                                jnp.array([[10.0], [10.0], [11.0]]))
        small = losses.coral_loss(jnp.array(src),
                                  jnp.array([[1.0], [1.0], [1.1]]))
        assert float(big) > float(small)

    def test_single_sample_returns_zero_not_nan(self):
        # reference coral NaNs at n=1 and callers guard; we return 0 under jit
        src = jnp.array([[1.0], [2.0]])
        tgt = jnp.array([[1.1]])
        out = losses.coral_loss(src, tgt)
        assert float(out) == 0.0

    def test_masked_equals_subset(self):
        rng = np.random.default_rng(0)
        x = jnp.array(rng.normal(size=(8, 4)).astype(np.float32))
        y = jnp.array(rng.normal(size=(8, 4)).astype(np.float32))
        xm = jnp.array([1, 1, 1, 0, 0, 0, 0, 0], jnp.float32)
        ym = jnp.array([1, 1, 1, 1, 0, 0, 0, 0], jnp.float32)
        masked = losses.coral_loss(x, y, xm, ym)
        subset = losses.coral_loss(x[:3], y[:4])
        assert abs(float(masked) - float(subset)) < 1e-5


class TestInfoNCE:
    def test_symmetric_ce_golden(self):
        # Golden: float64 numpy CLIP loss (normalize, scaled logits,
        # symmetric softmax CE with diagonal targets).
        rng = np.random.default_rng(1)
        img = rng.normal(size=(8, 16)).astype(np.float32)
        txt = rng.normal(size=(8, 16)).astype(np.float32)
        scale_param = float(np.log(1 / 0.07))
        logits = losses.clip_logits(jnp.array(img), jnp.array(txt),
                                    jnp.array(scale_param))
        ours = losses.symmetric_infonce(logits)

        def norm(x):
            return x / np.linalg.norm(x, axis=-1, keepdims=True)

        tl = norm(img.astype(np.float64)) @ norm(txt.astype(np.float64)).T
        tl *= min(np.exp(scale_param), 100.0)

        def ce(l):
            l = l - l.max(axis=1, keepdims=True)
            logp = l - np.log(np.exp(l).sum(axis=1, keepdims=True))
            return -np.diag(logp).mean()

        ref = (ce(tl) + ce(tl.T)) / 2
        # fp32 softmax with |logits|~14 vs fp64 golden: allow 1e-3 relative
        assert abs(float(ours) - float(ref)) / float(ref) < 1e-3

    def test_scale_clamped_at_100(self):
        img = jnp.eye(4, 8)
        logits = losses.clip_logits(img, img, jnp.array(10.0), scale_max=100.0)
        assert float(logits.max()) <= 100.0 + 1e-4

    def test_perfect_alignment_low_loss(self):
        emb = jnp.eye(8, 32)
        logits = losses.clip_logits(emb, emb, jnp.array(np.log(50.0)))
        assert float(losses.symmetric_infonce(logits)) < 1e-3

    def test_mask_excludes_padded_negatives(self):
        emb = jnp.eye(4, 8)
        # make padded row 3 identical to row 0 (a fake duplicate)
        img = emb.at[3].set(emb[0])
        txt = emb.at[3].set(emb[0])
        mask = jnp.array([1.0, 1.0, 1.0, 0.0])
        logits = losses.clip_logits(img, txt, jnp.array(np.log(50.0)))
        l_masked = losses.symmetric_infonce(logits, mask)
        l_sub = losses.symmetric_infonce(
            losses.clip_logits(img[:3], txt[:3], jnp.array(np.log(50.0))))
        assert abs(float(l_masked) - float(l_sub)) < 1e-5

    def test_duplicate_caption_mask(self):
        ids = jnp.array([5, 7, 5, 9])
        m = losses.duplicate_caption_mask(ids)
        assert m[0, 2] == 0.0 and m[2, 0] == 0.0  # duplicates masked
        assert m[0, 0] == 1.0 and m[2, 2] == 1.0  # diagonal kept
        assert m[0, 1] == 1.0

    def test_deprecated_variants_finite(self):
        rng = np.random.default_rng(0)
        logits = jnp.array(rng.normal(size=(6, 6)).astype(np.float32))
        ids = jnp.array([0, 1, 2, 0, 3, 4])
        assert np.isfinite(float(losses.masked_infonce(logits, ids)))
        assert np.isfinite(float(losses.non_square_infonce(logits, ids)))

    def test_deprecated_variants_ignore_padded_tail(self):
        """A padded ragged batch (tail rows repeat earlier samples, mask 0)
        must yield the SAME loss as the unpadded valid batch — the pipeline
        pads to static shapes, the reference's torch batches never did."""
        rng = np.random.default_rng(1)
        full = jnp.array(rng.normal(size=(6, 6)).astype(np.float32))
        ids = jnp.array([0, 1, 2, 3, 0, 1])  # tail repeats samples 0/1
        mask = jnp.array([1, 1, 1, 1, 0, 0], jnp.float32)
        sub = full[:4, :4]
        sub_ids = ids[:4]
        np.testing.assert_allclose(
            float(losses.masked_infonce(full, ids, mask)),
            float(losses.masked_infonce(sub, sub_ids)), rtol=1e-5)
        np.testing.assert_allclose(
            float(losses.non_square_infonce(full, ids, mask)),
            float(losses.non_square_infonce(sub, sub_ids)), rtol=1e-5)


class TestStreamingMetrics:
    def test_matches_sklearn(self):
        from sklearn.metrics import (
            accuracy_score,
            f1_score,
            precision_score,
            recall_score,
            roc_auc_score,
        )

        rng = np.random.default_rng(0)
        logits = rng.normal(size=500).astype(np.float32)
        labels = (rng.random(500) < 0.4).astype(np.float32)
        probs = 1 / (1 + np.exp(-logits))
        pred = (probs >= 0.5).astype(int)

        state = init_state()
        # stream in chunks (simulating per-step updates)
        for i in range(0, 500, 100):
            state = update_state(state, jnp.array(logits[i:i+100]),
                                 jnp.array(labels[i:i+100]))
        m = {k: float(v) for k, v in compute_metrics(state).items()}
        assert abs(m["accuracy"] - accuracy_score(labels, pred)) < 1e-6
        assert abs(m["precision"] - precision_score(labels, pred)) < 1e-6
        assert abs(m["recall"] - recall_score(labels, pred)) < 1e-6
        assert abs(m["f1"] - f1_score(labels, pred)) < 1e-6
        # histogram AUROC within quantization error of exact
        assert abs(m["auroc"] - roc_auc_score(labels, probs)) < 1e-3

    def test_merge_equals_single_pass(self):
        rng = np.random.default_rng(1)
        logits = jnp.array(rng.normal(size=64).astype(np.float32))
        labels = jnp.array((rng.random(64) < 0.5).astype(np.float32))
        s_all = update_state(init_state(), logits, labels)
        s_a = update_state(init_state(), logits[:32], labels[:32])
        s_b = update_state(init_state(), logits[32:], labels[32:])
        merged = merge_states(s_a, s_b)
        for k in compute_metrics(s_all):
            assert abs(float(compute_metrics(s_all)[k])
                       - float(compute_metrics(merged)[k])) < 1e-6

    def test_auroc_exact_matches_sklearn_with_ties(self):
        from sklearn.metrics import roc_auc_score

        rng = np.random.default_rng(2)
        scores = np.round(rng.random(300), 2)  # force ties
        labels = (rng.random(300) < 0.5).astype(int)
        assert abs(auroc_exact(scores, labels)
                   - roc_auc_score(labels, scores)) < 1e-12

    def test_binary_report_keys(self):
        rep = binary_report(np.array([0.9, 0.1, 0.8]), np.array([1, 0, 1]))
        assert rep["accuracy"] == 1.0
        assert rep["support"] == 3.0


class TestAugment:
    def _batch(self, b=4, s=64):
        rng = np.random.default_rng(0)
        return jnp.array(rng.integers(0, 255, (b, s, s), dtype=np.uint8))

    def test_shapes_and_dtype(self):
        x = self._batch()
        out = augment_and_normalize(x, jax.random.key(0), jnp.array(128.0),
                                    jnp.array(30.0), AugmentConfig(),
                                    out_channels=3, dtype=jnp.float32)
        assert out.shape == (4, 64, 64, 3)
        assert out.dtype == jnp.float32
        # channels are identical repeats
        np.testing.assert_array_equal(np.asarray(out[..., 0]),
                                      np.asarray(out[..., 1]))

    def test_disabled_equals_normalize_only(self):
        x = self._batch()
        cfg = AugmentConfig(enabled=False)
        a = augment_and_normalize(x, jax.random.key(0), jnp.array(100.0),
                                  jnp.array(25.0), cfg, dtype=jnp.float32)
        b = normalize_only(x, jnp.array(100.0), jnp.array(25.0),
                           dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_deterministic_given_key(self):
        x = self._batch()
        a = augment_and_normalize(x, jax.random.key(7), jnp.array(0.0),
                                  jnp.array(1.0), dtype=jnp.float32)
        b = augment_and_normalize(x, jax.random.key(7), jnp.array(0.0),
                                  jnp.array(1.0), dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_zero_prob_config_is_identity_warp(self):
        x = self._batch()
        cfg = AugmentConfig(translate_prob=0, rotate_prob=0, zoom_prob=0,
                            flip_prob=0, noise_prob=0)
        out = augment_and_normalize(x, jax.random.key(0), jnp.array(0.0),
                                    jnp.array(1.0), cfg, out_channels=1,
                                    dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out[..., 0]),
                                   np.asarray(x).astype(np.float32), atol=1e-3)

    def test_flip_only(self):
        x = self._batch()
        cfg = AugmentConfig(translate_prob=0, rotate_prob=0, zoom_prob=0,
                            flip_prob=1.0, noise_prob=0)
        out = augment_and_normalize(x, jax.random.key(0), jnp.array(0.0),
                                    jnp.array(1.0), cfg, out_channels=1,
                                    dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out[:, ::-1, :, 0]),
                                   np.asarray(x).astype(np.float32), atol=1e-3)

    def test_scale_intensity_xrv_range(self):
        x = jnp.zeros((2, 8, 8), jnp.uint8)
        out = normalize_only(x, jnp.array(0.0), jnp.array(1.0),
                             out_channels=1, dtype=jnp.float32,
                             scale_intensity=True)
        assert float(out.min()) == -1024.0
        x255 = jnp.full((2, 8, 8), 255, jnp.uint8)
        out2 = normalize_only(x255, jnp.array(0.0), jnp.array(1.0),
                              out_channels=1, dtype=jnp.float32,
                              scale_intensity=True)
        assert abs(float(out2.max()) - 1024.0) < 1e-3

    def test_translation_moves_content(self):
        # bright pixel at center; forced translate by +20 px should move it
        x = np.zeros((1, 64, 64), np.uint8)
        x[0, 32, 32] = 255
        cfg = AugmentConfig(translate_prob=1.0, rotate_prob=0, zoom_prob=0,
                            flip_prob=0, noise_prob=0)
        out = augment_and_normalize(jnp.array(x), jax.random.key(1),
                                    jnp.array(0.0), jnp.array(1.0), cfg,
                                    out_channels=1, dtype=jnp.float32)
        pos = np.unravel_index(np.argmax(np.asarray(out[0, :, :, 0])),
                               (64, 64))
        assert pos != (32, 32)


class TestRetrieval:
    def test_precision_at_k_perfect_clusters(self):
        # two tight clusters by label -> p@k = 1
        rng = np.random.default_rng(0)
        a = rng.normal(0, 0.01, (10, 8)) + np.array([10.0] + [0] * 7)
        b = rng.normal(0, 0.01, (10, 8)) + np.array([0] * 7 + [10.0])
        emb = jnp.array(np.vstack([a, b]).astype(np.float32))
        labels = jnp.array([0] * 10 + [1] * 10)
        out = label_precision_at_k(emb, labels, ks=(3, 5))
        assert float(out[3]) == 1.0
        assert float(out[5]) == 1.0

    def test_precision_at_k_matches_reference_style(self):
        # Golden: numpy top-(k+1)-drop-self semantics
        # (reference VisionLanguageModule.py:364-400)
        rng = np.random.default_rng(3)
        emb = rng.normal(size=(20, 16)).astype(np.float32)
        labels = (rng.random(20) < 0.5).astype(np.int32)
        ours = label_precision_at_k(jnp.array(emb), jnp.array(labels), ks=(5,))
        e = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        sims = e @ e.T
        idx = np.argsort(-sims, axis=1)[:, 1:6]  # top-6, drop self (col 0)
        correct = (labels[:, None] == labels[idx]).sum(1) / 5
        assert abs(float(ours[5]) - float(correct.mean())) < 1e-6

    def test_recall_at_k_identity(self):
        emb = jnp.eye(12, 16)
        out = image_text_recall_at_k(emb, emb, ks=(3,))
        assert float(out[3]) == 1.0

    def test_recall_at_k_shuffled(self):
        emb = np.eye(12, 16, dtype=np.float32)
        txt = np.roll(emb, 1, axis=0)  # correct text never most similar
        out = image_text_recall_at_k(jnp.array(emb), jnp.array(txt), ks=(3, 12))
        assert float(out[12]) == 1.0
        assert float(out[3]) < 1.0

    def test_masked_variants_match_compacted(self):
        """The on-device padded path (train/loop.py _validate_vlp) must
        equal the old host-compacted path exactly: masked metrics over
        [N_pad] padded buffers == unmasked metrics over the valid rows."""
        from vlp_tpu.ops.retrieval import (
            masked_image_text_recall_at_k,
            masked_label_precision_at_k,
        )

        rng = np.random.default_rng(7)
        n_pad, n_valid = 40, 29
        img = rng.normal(size=(n_pad, 16)).astype(np.float32)
        txt = rng.normal(size=(n_pad, 16)).astype(np.float32)
        labels = rng.integers(0, 3, n_pad).astype(np.int32)
        # interleaved mask (padding appears at scan-chunk tails, but the
        # math must not care where)
        mask = np.zeros(n_pad, np.float32)
        mask[rng.permutation(n_pad)[:n_valid]] = 1.0
        keep = mask > 0
        ks = (3, 5, 10)
        mp = masked_label_precision_at_k(
            jnp.array(img), jnp.array(labels), jnp.array(mask), ks=ks)
        up = label_precision_at_k(
            jnp.array(img[keep]), jnp.array(labels[keep]), ks=ks)
        mr = masked_image_text_recall_at_k(
            jnp.array(img), jnp.array(txt), jnp.array(mask), ks=ks)
        ur = image_text_recall_at_k(
            jnp.array(img[keep]), jnp.array(txt[keep]), ks=ks)
        for k in ks:
            assert abs(float(mp[k]) - float(up[k])) < 1e-6, k
            assert abs(float(mr[k]) - float(ur[k])) < 1e-6, k

    def test_masked_all_valid_matches_unmasked(self):
        from vlp_tpu.ops.retrieval import (
            masked_image_text_recall_at_k,
            masked_label_precision_at_k,
        )

        rng = np.random.default_rng(11)
        img = jnp.array(rng.normal(size=(20, 8)).astype(np.float32))
        txt = jnp.array(rng.normal(size=(20, 8)).astype(np.float32))
        labels = jnp.array(rng.integers(0, 2, 20).astype(np.int32))
        ones = jnp.ones(20, jnp.float32)
        mp = masked_label_precision_at_k(img, labels, ones, ks=(5,))
        up = label_precision_at_k(img, labels, ks=(5,))
        assert abs(float(mp[5]) - float(up[5])) < 1e-6
        mr = masked_image_text_recall_at_k(img, txt, ones, ks=(5,))
        ur = image_text_recall_at_k(img, txt, ks=(5,))
        assert abs(float(mr[5]) - float(ur[5])) < 1e-6


class TestShearAugmentation:
    def test_pretrain_shear_path_changes_output(self):
        """shear_deg>0 (pretrain config) must engage and alter images."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, 255, (4, 64, 64), dtype=np.uint8))
        base = AugmentConfig(translate_prob=0, rotate_prob=0, zoom_prob=0,
                             flip_prob=0, noise_prob=0, shear_deg=0.0)
        sheared = base._replace(shear_deg=5.0, translate_prob=1.0,
                                translate_px=0.0)  # force the shear gate on
        a = augment_and_normalize(x, jax.random.key(3), jnp.float32(0.0),
                                  jnp.float32(1.0), base, out_channels=1,
                                  dtype=jnp.float32)
        b = augment_and_normalize(x, jax.random.key(3), jnp.float32(0.0),
                                  jnp.float32(1.0), sheared, out_channels=1,
                                  dtype=jnp.float32)
        assert float(jnp.abs(a - b).max()) > 0.5


class TestAugmentDistribution:
    """RNG hygiene of _sample_params: applied magnitudes must be independent
    of the fire/no-fire gate (sharing a key makes bernoulli(k,p)==uniform(k)<p
    collapse the applied values into the bottom p-quantile), and shear must
    co-fire with translate under ONE RandAffined-style Bernoulli
    (reference PretrainDataModule.py:186-198)."""

    N = 20000

    @pytest.fixture(scope="class")
    def draws(self):
        from vlp_tpu.ops.augment import _sample_params

        cfg = AugmentConfig(shear_deg=5.0)
        out = _sample_params(jax.random.key(7), cfg, self.N)
        names = ("tx", "ty", "theta", "zoom", "shear", "flip", "noise_std")
        return cfg, {k: np.asarray(v) for k, v in zip(names, out)}

    @staticmethod
    def _ks_uniform(x, lo, hi):
        """KS statistic of x against U(lo, hi)."""
        x = np.sort((x - lo) / (hi - lo))
        n = len(x)
        grid = np.arange(1, n + 1) / n
        return max(np.abs(grid - x).max(), np.abs(grid - 1 / n - x).max())

    def test_fire_rates(self, draws):
        cfg, d = draws
        for key, prob in (("theta", cfg.rotate_prob), ("tx", cfg.translate_prob),
                          ("noise_std", cfg.noise_prob)):
            rate = (d[key] != 0).mean()
            assert abs(rate - prob) < 0.02, (key, rate)
        assert abs((d["zoom"] != 1.0).mean() - cfg.zoom_prob) < 0.02

    def test_applied_magnitudes_cover_full_range_uniformly(self, draws):
        cfg, d = draws
        cases = [
            (d["theta"][d["theta"] != 0], -cfg.rotate_rad, cfg.rotate_rad),
            (d["tx"][d["tx"] != 0], -cfg.translate_px, cfg.translate_px),
            (d["ty"][d["ty"] != 0], -cfg.translate_px, cfg.translate_px),
            (d["zoom"][d["zoom"] != 1.0], cfg.zoom_min, cfg.zoom_max),
            (d["shear"][d["shear"] != 0], -np.deg2rad(cfg.shear_deg),
             np.deg2rad(cfg.shear_deg)),
            (d["noise_std"][d["noise_std"] != 0], 0.0, cfg.noise_std),
        ]
        for applied, lo, hi in cases:
            n = len(applied)
            assert n > 1000
            # spans the range with both tails populated
            assert applied.min() < lo + 0.05 * (hi - lo)
            assert applied.max() > hi - 0.05 * (hi - lo)
            # KS vs U(lo,hi); 1.95/sqrt(n) is the alpha=0.001 critical value
            assert self._ks_uniform(applied, lo, hi) < 1.95 / np.sqrt(n)

    def test_shear_translate_co_occurrence(self, draws):
        cfg, d = draws
        fired = d["tx"] != 0
        np.testing.assert_array_equal(d["shear"] != 0, fired)
        np.testing.assert_array_equal(d["ty"] != 0, fired)

    def test_gate_independent_of_other_gates(self, draws):
        _, d = draws
        rot, zoom = d["theta"] != 0, d["zoom"] != 1.0
        joint = (rot & zoom).mean()
        assert abs(joint - rot.mean() * zoom.mean()) < 0.02


class TestDeprecatedVariantsReferenceParity:
    """Golden parity for the deprecated duplicate-caption ablation losses:
    the torch blocks below transliterate the reference's exact code
    (VisionLanguageModule.py:464-530, :546-553) and must agree numerically."""

    def _setup(self, seed=0, n=8):
        rng = np.random.default_rng(seed)
        logits = rng.normal(size=(n, n)).astype(np.float32)
        captions = [f"cap{int(c)}" for c in rng.integers(0, 5, size=n)]
        _, caption_ids = np.unique(captions, return_inverse=True)
        return logits, captions, caption_ids.astype(np.int32)

    def test_masked_matches_reference_torch(self):
        import torch
        import torch.nn.functional as F

        logits_np, captions, cids = self._setup()
        # --- reference _get_mask + logits*mask + symmetric CE ---
        t = torch.tensor(logits_np)
        unique_captions = {c: i for i, c in enumerate(set(captions))}
        caption_ids = torch.tensor([unique_captions[c] for c in captions])
        eq = caption_ids.unsqueeze(0) == caption_ids.unsqueeze(1)
        mask = torch.ones_like(eq, dtype=torch.float)
        mask[eq & ~torch.eye(len(captions), dtype=torch.bool)] = 0.0
        masked = t * mask
        labels = torch.arange(len(captions))
        want = ((F.cross_entropy(masked, labels)
                 + F.cross_entropy(masked.T, labels)) / 2).item()

        got = float(losses.masked_infonce(jnp.asarray(logits_np),
                                          jnp.asarray(cids)))
        assert got == pytest.approx(want, rel=1e-5)

    def test_non_square_matches_reference_torch(self):
        import torch

        logits_np, captions, cids = self._setup(seed=1)
        # --- reference _compute_non_square_loss ---
        t = torch.tensor(logits_np)
        _, caption_ids = np.unique(captions, return_inverse=True)
        caption_ids = torch.tensor(caption_ids, dtype=torch.int64)
        unique_vals = torch.unique(caption_ids)
        class_indices = [(caption_ids == v).nonzero(as_tuple=True)[0].tolist()
                         for v in unique_vals]
        selected = torch.stack(
            [torch.where(caption_ids == uid)[0][0] for uid in unique_vals])
        sel_logits = t[:, selected]
        labels = torch.zeros_like(sel_logits)
        for class_id, idxs in enumerate(class_indices):
            labels[idxs, class_id] = 1.0
        want = torch.nn.BCEWithLogitsLoss()(sel_logits, labels).item()

        got = float(losses.non_square_infonce(jnp.asarray(logits_np),
                                              jnp.asarray(cids)))
        assert got == pytest.approx(want, rel=1e-5)

    def test_non_square_all_unique_equals_dense_bce(self):
        rng = np.random.default_rng(2)
        logits = jnp.asarray(rng.normal(size=(6, 6)).astype(np.float32))
        cids = jnp.arange(6, dtype=jnp.int32)
        got = float(losses.non_square_infonce(logits, cids))
        target = np.eye(6, dtype=np.float32)
        l = np.asarray(logits)
        per = np.maximum(l, 0) - l * target + np.log1p(np.exp(-np.abs(l)))
        assert got == pytest.approx(float(per.mean()), rel=1e-6)
