"""Image near-dup detection via dHash: a slightly perturbed copy of an
image must be found (small Hamming distance), unrelated images must
not collide."""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import functions as F

from tripl_spark.operators import media_codecs as mc
from tripl_spark.operators.multimodal import image_dhash, image_near_dup_pairs


def _image(rng, w=32, h=24):
    return bytes(rng.randrange(256) for _ in range(w * h * 3))


def test_perturbed_copy_detected_unrelated_not(spark):
    rng = random.Random(11)
    rows = []
    for i in range(10):
        px = _image(rng)
        rows.append((i * 2, mc.encode_ppm(32, 24, px)))
        # near-dup: brighten a single pixel channel slightly — the
        # gradient signs of a 9x8 downsample barely move
        perturbed = bytearray(px)
        perturbed[0] = min(255, perturbed[0] + 4)
        rows.append((i * 2 + 1, mc.encode_bmp(32, 24, bytes(perturbed))))
    images = spark.createDataFrame(
        pd.DataFrame({"doc_id": [r[0] for r in rows],
                      "codec": ["x"] * len(rows),
                      "payload": [r[1] for r in rows]})
    )
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in image_near_dup_pairs(image_dhash(images)).collect()}
    planted = {(i * 2, i * 2 + 1) for i in range(10)}
    found = planted & set(pairs)
    # every perturbed copy found, at tiny Hamming distance
    assert len(found) == 10, pairs
    assert all(pairs[p] <= 3 for p in found)
    # no false positives between unrelated random images
    assert set(pairs) == planted, pairs


def test_dhash_deterministic_across_codecs(spark):
    # the same pixels encoded as BMP and PPM must hash identically
    rng = random.Random(4)
    px = _image(rng)
    images = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "codec": ["bmp", "ppm"],
                      "payload": [mc.encode_bmp(32, 24, px), mc.encode_ppm(32, 24, px)]})
    )
    hashes = [r.dhash for r in image_dhash(images).collect()]
    assert hashes[0] == hashes[1] and len(hashes[0]) == 64


def test_audio_fingerprint_robust_to_gain(spark):
    # uniform gain change flips no energy-delta signs → identical print
    import numpy as np

    from tripl_spark.operators.multimodal import audio_fingerprint

    rng = random.Random(8)
    base = np.array([rng.randrange(-20000, 20000) for _ in range(300)], dtype=np.int16)
    half = (base // 2).astype(np.int16)
    audio = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2],
                      "payload": [mc.encode_wav(base, 8000), mc.encode_wav(half, 8000)]})
    )
    fps = {r.doc_id: r.fingerprint for r in audio_fingerprint(audio).collect()}
    assert fps[1] == fps[2] and len(fps[1]) == 64


def test_video_shared_frame_detected(spark):
    from tripl_spark.operators.multimodal import (
        video_frame_dhashes,
        video_near_dup_pairs,
    )

    rng = random.Random(3)
    shared = bytes(rng.randrange(256) for _ in range(16 * 3))  # one 4x4 frame
    def vid(*frames):
        return b"".join(mc.encode_ppm(4, 4, f) for f in frames)
    uniq = lambda: bytes(rng.randrange(256) for _ in range(16 * 3))
    videos = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [1, 2, 3],
            "n_frames": [2, 3, 2],
            "payload": [vid(uniq(), shared), vid(shared, uniq(), uniq()),
                        vid(uniq(), uniq())],
        })
    )
    pairs = {(r.id_a, r.id_b): r.n_shared_frames
             for r in video_near_dup_pairs(video_frame_dhashes(videos)).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert all(p == (1, 2) for p in pairs), pairs


def test_audio_gain_copies_pair_and_group(spark):
    """Planted recall for the audio near-dup family: gain-halved
    copies of a clip must pair (Hamming 0 — the fingerprint is
    gain-invariant) and resolve to one canonical family; unrelated
    random clips must not collide."""
    import numpy as np

    from tripl_spark.operators.multimodal import (
        audio_fingerprint,
        audio_near_dup_pairs,
        dedup_groups_over_pairs,
    )

    rng = random.Random(21)
    rows = []
    for i in range(8):
        base = np.array(
            [rng.randrange(-20000, 20000) for _ in range(300 + i * 7)],
            dtype=np.int16,
        )
        rows.append((i * 3, mc.encode_wav(base, 8000)))
        rows.append((i * 3 + 1, mc.encode_wav((base // 2).astype(np.int16), 8000)))
        rows.append((i * 3 + 2, mc.encode_wav((base // 4).astype(np.int16), 8000)))
    audio = spark.createDataFrame(
        pd.DataFrame({"doc_id": [r[0] for r in rows],
                      "payload": [r[1] for r in rows]})
    )
    fps = audio_fingerprint(audio)
    pairs = audio_near_dup_pairs(fps)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    for i in range(8):
        a, b, c = i * 3, i * 3 + 1, i * 3 + 2
        assert got.get((a, b)) == 0 and got.get((a, c)) == 0, got
    # no cross-family collisions
    assert all(x // 3 == y // 3 for x, y in got), got

    nodes = spark.createDataFrame([(r[0],) for r in rows], "doc_id long")
    groups = {
        r.doc_id: (r.group_id, r.group_size, r.keep)
        for r in dedup_groups_over_pairs(spark, "", pairs, nodes=nodes).collect()
    }
    for i in range(8):
        a = i * 3
        for d in (a, a + 1, a + 2):
            assert groups[d][0] == a and groups[d][1] == 3
            assert groups[d][2] == (d == a)  # smallest doc_id keeps


def test_video_shared_frame_families_group(spark):
    """Planted recall for the video group resolver: a re-cut copy
    chains to its source through any shared frame; transitive chains
    (A~B, B~C via different frames) must land in ONE family."""
    from tripl_spark.operators.multimodal import (
        dedup_groups_over_pairs,
        video_frame_dhashes,
        video_near_dup_pairs,
    )

    rng = random.Random(5)
    uniq = lambda: bytes(rng.randrange(256) for _ in range(16 * 3))
    f1, f2 = uniq(), uniq()
    def vid(*frames):
        return b"".join(mc.encode_ppm(4, 4, f) for f in frames)
    videos = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [0, 1, 2, 3, 4],
            "n_frames": [2, 2, 2, 2, 2],
            # 0~1 share f1, 1~2 share f2 (transitive chain), 3 and 4
            # are unrelated
            "payload": [vid(f1, uniq()), vid(f1, f2), vid(f2, uniq()),
                        vid(uniq(), uniq()), vid(uniq(), uniq())],
        })
    )
    pairs = video_near_dup_pairs(video_frame_dhashes(videos))
    nodes = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    groups = {
        r.doc_id: (r.group_id, r.group_size, r.keep)
        for r in dedup_groups_over_pairs(spark, "", pairs, nodes=nodes).collect()
    }
    assert groups[0] == (0, 3, True)
    assert groups[1] == (0, 3, False) and groups[2] == (0, 3, False)
    assert groups[3] == (3, 1, True) and groups[4] == (4, 1, True)


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_memberships = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),   # doc
        st.integers(min_value=0, max_value=5),   # frame-hash bucket
    ),
    min_size=1,
    max_size=25,
)


@given(mem=_memberships)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_star_edges_equal_pair_clique_components(spark, mem):
    """The r9 video-groups optimization replaces the all-pairs clique
    inside each frame-hash bucket with star edges to the bucket's min
    doc. For a shares->=1 relation these give IDENTICAL connected
    components — pinned here against a pure-Python closure over the
    full pair clique, for arbitrary membership shapes (hub buckets,
    singleton docs, multi-bucket docs chaining families)."""
    from tripl_spark.plans.graph import connected_components

    docs = sorted({d for d, _ in mem})
    # python reference: union-find over ALL within-bucket pairs
    parent = {d: d for d in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    buckets: dict = {}
    for d, h in mem:
        buckets.setdefault(h, set()).add(d)
    for members in buckets.values():
        ms = sorted(members)
        for b in ms[1:]:
            ra, rb = find(ms[0]), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    want = {d: find(d) for d in docs}

    fh = spark.createDataFrame(
        sorted(set(mem)), "doc_id long, dhash long"
    )
    small = fh.groupBy("dhash").agg(F.min("doc_id").alias("root"))
    stars = (
        fh.join(small, "dhash")
        .filter(F.col("doc_id") != F.col("root"))
        .select(F.col("root").alias("src"), F.col("doc_id").alias("dst"))
        .distinct()
    )
    nodes = spark.createDataFrame([(d,) for d in docs], "node long")
    got = {
        r["node"]: r["comp"]
        for r in connected_components(stars, nodes=nodes).collect()
    }
    assert got == want


def test_video_pair_cache_does_not_outlive_the_call(spark):
    """Long-lived-session invariant: video_near_dup_pairs unpersists
    its distinct-hash intermediate before returning — after the call,
    at most the localCheckpoint block backing the RETURNED pair list
    remains, never the frame-hash cache."""
    from tripl_spark.operators.multimodal import video_near_dup_pairs

    sc = spark.sparkContext

    def n_cached() -> int:
        return len(sc._jsc.sc().getRDDStorageInfo())

    fh = spark.createDataFrame(
        [(1, 0, "0101"), (2, 0, "0101"), (3, 0, "1111")],
        "doc_id long, frame_idx int, dhash string",
    )
    before = n_cached()
    res = video_near_dup_pairs(fh)
    assert {(r.id_a, r.id_b) for r in res.collect()} == {(1, 2)}
    assert n_cached() <= before + 1, sc._jsc.sc().getRDDStorageInfo()


_fp_pairs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=(1 << 64) - 1),  # base fp
        st.sets(st.integers(min_value=0, max_value=63),     # flipped bits
                min_size=0, max_size=3),
    ),
    min_size=1,
    max_size=8,
)


@given(pairs=_fp_pairs)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_audio_banding_pigeonhole_guarantee(spark, pairs):
    """The recall guarantee of 4x16-bit pigeonhole banding: ANY pair
    within Hamming <= 3 must agree on >= 1 whole band and therefore be
    emitted (uncapped) with its EXACT Hamming distance — for arbitrary
    fingerprints and arbitrary <=3-bit perturbations."""
    from tripl_spark.operators.multimodal import audio_near_dup_pairs

    rows, want = [], {}
    for i, (base, flips) in enumerate(pairs):
        pert = base
        for b in flips:
            pert ^= 1 << b
        a_id, b_id = i * 2, i * 2 + 1
        rows.append((a_id, format(base, "064b")))
        rows.append((b_id, format(pert, "064b")))
        want[(a_id, b_id)] = len(flips)
    fps = spark.createDataFrame(rows, "doc_id long, fingerprint string")
    got = {(r.id_a, r.id_b): r.hamming
           for r in audio_near_dup_pairs(fps, max_bucket=None).collect()}
    for pair, ham in want.items():
        assert got.get(pair) == ham, (pair, ham, got)


def test_image_degenerate_band_bucket_capped(spark):
    """A solid-color image family all share the all-zero-gradient
    dHash, so every band key is identical across the family — the
    content-correlated degenerate class that makes an uncapped band
    join quadratic at corpus scale. With the cap (max_bucket below the
    family size) the degenerate buckets are dropped BEFORE pairing, so
    the family contributes ZERO candidate pairs while normal near-dup
    recall is untouched."""
    rng = random.Random(17)
    rows = []
    # a planted "boilerplate" family: 12 solid-color images (identical
    # gradients -> identical dHash) ...
    for i in range(12):
        shade = 10 * i  # different colors, SAME (flat) gradient signs
        rows.append((i, mc.encode_ppm(32, 24, bytes([shade % 256]) * (32 * 24 * 3))))
    # ... plus one genuine near-dup pair of textured images
    px = _image(rng)
    pert = bytearray(px)
    pert[0] = min(255, pert[0] + 4)
    rows.append((100, mc.encode_ppm(32, 24, px)))
    rows.append((101, mc.encode_bmp(32, 24, bytes(pert))))
    images = spark.createDataFrame(
        pd.DataFrame({"doc_id": [r[0] for r in rows],
                      "codec": ["x"] * len(rows),
                      "payload": [r[1] for r in rows]})
    )
    hashes = image_dhash(images)
    # the solid-color family really is degenerate: one shared dhash
    assert hashes.filter(F.col("doc_id") < 100).select("dhash").distinct().count() == 1

    capped = {(r.id_a, r.id_b)
              for r in image_near_dup_pairs(hashes, max_bucket=8).collect()}
    assert capped == {(100, 101)}, capped  # family dropped, real pair kept

    # uncapped, the family explodes to C(12,2) = 66 pairs — the
    # quadratic blowup the cap exists to prevent
    uncapped = image_near_dup_pairs(hashes, max_bucket=None).count()
    assert uncapped == 66 + 1


def test_audio_cap_spares_uniform_mass_wide_bands(spark):
    """The r12 point of the 16-bit band widening: on a UNIFORM corpus
    the cap must be a no-op — capped and uncapped pair sets identical
    at a corpus size where the old 8-bit keys (256/band) already
    averaged >1 member per bucket and the cap was provably at risk of
    dropping real near-dups. Also pins recall: planted gain-copies
    survive the cap at every corpus size step (recall does not decay
    with corpus growth, the r11 'weak' failure mode)."""
    import numpy as np

    from tripl_spark.operators.multimodal import (
        AUDIO_BAND_MAX_BUCKET,
        audio_fingerprint,
        audio_near_dup_pairs,
    )

    rng = random.Random(99)

    def corpus(n_uniform: int, n_families: int):
        rows = []
        for i in range(n_uniform):
            samples = np.array(
                [rng.randrange(-20000, 20000) for _ in range(280 + i % 60)],
                dtype=np.int16,
            )
            rows.append((10_000 + i, mc.encode_wav(samples, 8000)))
        planted = []
        for f in range(n_families):
            base = np.array(
                [rng.randrange(-20000, 20000) for _ in range(300 + f * 3)],
                dtype=np.int16,
            )
            a, b = f * 2, f * 2 + 1
            rows.append((a, mc.encode_wav(base, 8000)))
            rows.append((b, mc.encode_wav((base // 2).astype(np.int16), 8000)))
            planted.append((a, b))
        return rows, planted

    for n_uniform in (200, 800):  # 800 clips * 4 bands >> 256 old keys
        rows, planted = corpus(n_uniform, n_families=5)
        audio = spark.createDataFrame(
            pd.DataFrame({"doc_id": [r[0] for r in rows],
                          "payload": [r[1] for r in rows]})
        )
        fps = audio_fingerprint(audio)
        capped = {(r.id_a, r.id_b) for r in audio_near_dup_pairs(fps).collect()}
        uncapped = {
            (r.id_a, r.id_b)
            for r in audio_near_dup_pairs(fps, max_bucket=None).collect()
        }
        # cap is a no-op on uniform mass: identical pair sets
        assert capped == uncapped, (n_uniform, capped ^ uncapped)
        # planted recall holds at every corpus size (no decay)
        assert set(planted) <= capped, (n_uniform, set(planted) - capped)
    assert AUDIO_BAND_MAX_BUCKET is not None  # cap still on for degenerates
