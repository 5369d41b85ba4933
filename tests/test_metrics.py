"""Metric tests vs a numpy transcription of reference utils/metrics.py."""

import numpy as np
import jax.numpy as jnp

from segtpu import metrics


def reference_eval_metrics(output, target, num_class):
    """Numpy port of reference utils/metrics.py:42-67 (histc +1-shift trick)."""
    predict = output.argmax(-1) + 1
    target = target + 1
    labeled = (target > 0) & (target <= num_class)
    correct = ((predict == target) & labeled).sum()
    num_labeled = labeled.sum()
    predict = predict * labeled
    intersection = predict * (predict == target)
    area_inter, _ = np.histogram(intersection, bins=num_class, range=(1, num_class + 1))
    area_pred, _ = np.histogram(predict, bins=num_class, range=(1, num_class + 1))
    area_lab, _ = np.histogram(target[labeled], bins=num_class, range=(1, num_class + 1))
    return correct, num_labeled, area_inter, area_pred + area_lab - area_inter


def test_seg_stats_matches_reference(rng):
    c = 6
    logits = rng.standard_normal((2, 10, 10, c)).astype(np.float32)
    target = rng.integers(0, c, size=(2, 10, 10)).astype(np.int64)
    target[rng.random(target.shape) < 0.2] = 255

    stats = metrics.seg_stats_from_logits(jnp.asarray(logits), jnp.asarray(target))
    correct, labeled, inter, union = reference_eval_metrics(logits, target, c)
    assert float(stats.correct) == correct
    assert float(stats.labeled) == labeled
    np.testing.assert_array_equal(np.asarray(stats.inter), inter)
    np.testing.assert_array_equal(np.asarray(stats.union), union)


def test_seg_stats_negative_ignore(rng):
    """ADE20K-style ignore=-1 must be excluded too."""
    c = 4
    logits = rng.standard_normal((1, 5, 5, c)).astype(np.float32)
    target = rng.integers(-1, c, size=(1, 5, 5)).astype(np.int64)
    stats = metrics.seg_stats_from_logits(jnp.asarray(logits), jnp.asarray(target))
    assert float(stats.labeled) == (target >= 0).sum()


def test_stats_accumulate_and_summarize(rng):
    c = 3
    total = metrics.SegStats.zeros(c)
    all_logits, all_targets = [], []
    for _ in range(3):
        logits = rng.standard_normal((1, 4, 4, c)).astype(np.float32)
        target = rng.integers(0, c, size=(1, 4, 4)).astype(np.int64)
        all_logits.append(logits)
        all_targets.append(target)
        total = total + metrics.seg_stats_from_logits(jnp.asarray(logits), jnp.asarray(target))
    big = metrics.seg_stats_from_logits(
        jnp.asarray(np.concatenate(all_logits)), jnp.asarray(np.concatenate(all_targets)))
    np.testing.assert_allclose(np.asarray(total.inter), np.asarray(big.inter))
    summary = metrics.summarize(total)
    assert 0.0 <= summary["Pixel_Accuracy"] <= 1.0
    assert 0.0 <= summary["Mean_IoU"] <= 1.0
    assert len(summary["Class_IoU"]) == c


def test_average_meter():
    m = metrics.AverageMeter()
    m.update(1.0, weight=1)
    m.update(3.0, weight=3)
    assert m.average == (1.0 + 9.0) / 4
    assert m.val == 3.0


def test_seg_stats_from_logits_matches_argmax_path(rng):
    """Both logits-direct paths (the default fast_argmax one and the kept
    one-hot-direct loser) must equal seg_stats(argmax(logits)) exactly —
    including tied maxima (first occurrence wins) and ignored pixels."""
    import jax.numpy as jnp

    from segtpu.metrics import (seg_stats, seg_stats_from_logits,
                                seg_stats_from_logits_onehot)
    from segtpu.ops.reductions import onehot_first_max

    C = 7
    logits = rng.standard_normal((2, 9, 11, C)).astype(np.float32)
    logits[0, 3, 4, 1] = logits[0, 3, 4, 5] = 9.0  # tie
    logits[1, :, 2, 0] = logits[1, :, 2, 6] = 4.0  # column of ties
    target = rng.integers(0, C, (2, 9, 11)).astype(np.int32)
    target[0, :2] = 255  # ignore
    target[1, 5, :] = -1  # negative ignore

    oh = np.asarray(onehot_first_max(jnp.asarray(logits.reshape(-1, C))))
    np.testing.assert_array_equal(
        oh, np.eye(C, dtype=np.float32)[np.argmax(logits, -1).reshape(-1)])

    want = seg_stats(jnp.asarray(np.argmax(logits, -1)), jnp.asarray(target), C)
    for fn in (seg_stats_from_logits, seg_stats_from_logits_onehot):
        got = fn(jnp.asarray(logits), jnp.asarray(target))
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=0, atol=0)


def test_seg_stats_from_logits_bf16_packed_default(rng):
    """With bfloat16 logits (the train step's dtype), seg_stats_from_logits
    routes to packed_argmax; the stats must equal seg_stats(argmax) on the
    same bf16 values exactly, ties and ignore pixels included."""
    import jax.numpy as jnp

    from segtpu.metrics import seg_stats, seg_stats_from_logits

    C = 19
    logits = jnp.asarray(rng.standard_normal((2, 9, 11, C)) * 4, jnp.bfloat16)
    logits = logits.at[0, 3, 4, 1].set(9.0).at[0, 3, 4, 5].set(9.0)  # tie
    target = rng.integers(0, C, (2, 9, 11)).astype(np.int32)
    target[0, :2] = 255  # ignore
    ref = np.argmax(np.asarray(logits, np.float32), -1)
    want = seg_stats(jnp.asarray(ref), jnp.asarray(target), C)
    got = seg_stats_from_logits(logits, jnp.asarray(target))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=0, atol=0)
