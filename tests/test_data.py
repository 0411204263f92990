"""Data layer tests over a synthetic DAVIS-layout tree (SURVEY.md §4)."""

import os
import time

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from timetuning_tpu.data.datasets import (
    SamplingMode,
    VideoDataset,
    build_dataset_tree,
    diff_annotation_data_directories,
    generate_clip_indices,
    train_val_split,
)
from timetuning_tpu.data.loader import ClipLoader, make_loader


@pytest.fixture(scope="module")
def davis_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("davis")
    frames = root / "JPEGImages" / "480p"
    annots = root / "Annotations" / "480p"
    rng = np.random.default_rng(0)
    for v in range(3):
        fdir = frames / f"video{v}"
        adir = annots / f"video{v}"
        fdir.mkdir(parents=True)
        adir.mkdir(parents=True)
        for f in range(8):
            img = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
            cv2.imwrite(str(fdir / f"{f:05d}.jpg"), img)
            ann = np.zeros((48, 64), np.uint8)
            ann[:, : 8 * (v + 1)] = v + 1
            cv2.imwrite(str(adir / f"{f:05d}.png"), ann)
    return str(root)


def test_gray_means_thread_through(davis_tree, tmp_path):
    """Per-frame native PIL grayscale means flow dataset → Batch → pack:
    VideoDataset computes them at decode time on the pre-resize frame;
    ClipLoader batches them; the pack index records them so PackedVideoDataset
    reproduces the JPEG dataset's values exactly."""
    from PIL import Image, ImageStat

    from timetuning_tpu.data.datasets import PackedVideoDataset
    from timetuning_tpu.native import build_clip_pack

    froot = os.path.join(davis_tree, "JPEGImages", "480p")
    aroot = os.path.join(davis_tree, "Annotations", "480p")
    ds = VideoDataset(frames_root=froot, annotations_root=aroot,
                      sampling_mode=SamplingMode.DENSE, num_frames=3,
                      decode_size=32)
    item = ds[0]
    assert item["gray_means"].shape == (1, 3)
    # oracle: PIL's mean of convert("L") on the native (undecimated) file
    files = ds.tree[ds.keys[0]]
    # DENSE mode from a fixed seed — recover which frames were sampled by
    # matching the first decoded frame against each file
    idx0 = None
    for i, fp in enumerate(files):
        img = cv2.cvtColor(cv2.imread(fp), cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (32, 32), interpolation=cv2.INTER_LINEAR)
        if np.array_equal(img, item["frames"][0, 0]):
            idx0 = i
            break
    assert idx0 is not None
    with Image.open(files[idx0]) as im:
        want = ImageStat.Stat(im.convert("RGB").convert("L")).mean[0]
    np.testing.assert_allclose(item["gray_means"][0, 0], want, atol=5e-2)

    loader = ClipLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    batch = next(iter(loader))
    assert batch.gray_means is not None
    assert batch.gray_means.shape == (2, 3)

    pack = str(tmp_path / "t.clippack")
    build_clip_pack(ds, pack)
    pds = PackedVideoDataset(frames_root=froot, annotations_root=aroot,
                             sampling_mode=SamplingMode.DENSE, num_frames=3,
                             decode_size=32, pack_path=pack)
    pitem = pds[0]
    np.testing.assert_allclose(
        pitem["gray_means"], item["gray_means"], atol=1e-3
    )


def test_build_tree(davis_tree):
    tree = build_dataset_tree(os.path.join(davis_tree, "JPEGImages"))
    assert len(tree) == 3
    assert all(len(v) == 8 for v in tree.values())


def test_sampling_modes():
    import random

    rng = random.Random(0)
    for mode in SamplingMode:
        idx = generate_clip_indices(rng, 20, 4, 2, mode, regular_step=3)
        assert len(idx) == 2
        for clip in idx:
            if mode == SamplingMode.FULL:
                assert list(clip) == list(range(20))
            else:
                assert len(clip) == 4
                assert all(0 <= i < 20 for i in clip)
                assert list(clip) == sorted(clip)
        if mode == SamplingMode.REGULAR:
            steps = np.diff(idx[0])
            assert np.all(steps == 3)
        if mode == SamplingMode.DENSE:
            assert np.all(np.diff(idx[0]) == 1)


def test_short_video_sampling():
    import random

    idx = generate_clip_indices(random.Random(0), 2, 4, 1, SamplingMode.UNIFORM)
    assert len(idx[0]) == 4  # sampled with replacement


def test_video_dataset_shapes(davis_tree):
    ds = VideoDataset(
        frames_root=os.path.join(davis_tree, "JPEGImages"),
        annotations_root=os.path.join(davis_tree, "Annotations"),
        num_frames=4,
        decode_size=64,
    )
    assert len(ds) == 3
    item = ds[0]
    assert item["frames"].shape == (1, 4, 64, 64, 3)
    assert item["annotations"].shape == (1, 4, 64, 64)
    assert item["frames"].dtype == np.uint8
    # annotation labels survive the nearest resize
    assert set(np.unique(item["annotations"])) <= {0, 1, 2, 3}


def test_dataset_epoch_determinism(davis_tree):
    ds = VideoDataset(
        frames_root=os.path.join(davis_tree, "JPEGImages"),
        annotations_root=os.path.join(davis_tree, "Annotations"),
        num_frames=3,
        decode_size=32,
    )
    a = ds[1]["frames"]
    b = ds[1]["frames"]
    np.testing.assert_array_equal(a, b)  # same epoch → same clip
    ds.set_epoch(1)
    c = ds[1]["frames"]
    assert not np.array_equal(a, c)  # new epoch → new sample


def test_clip_loader_sharding(davis_tree):
    ds = VideoDataset(
        frames_root=os.path.join(davis_tree, "JPEGImages"),
        annotations_root=os.path.join(davis_tree, "Annotations"),
        num_frames=2,
        decode_size=32,
    )
    seen = []
    counts = []
    for rank in range(2):
        loader = ClipLoader(
            ds, batch_size=1, shuffle=False, world_size=2, rank=rank,
            drop_last=False, num_workers=2,
        )
        got = []
        for frames, annots, labels in loader:
            assert frames.shape == (1, 2, 32, 32, 3)
            got += labels.tolist()
        counts.append(len(got))
        assert len(got) == len(loader)  # __len__ must match actual yields
        seen += got
    # DistributedSampler padding semantics: full coverage AND equal per-rank
    # counts (unequal counts would deadlock cross-host collectives — one
    # rank would run a step the others never join)
    assert set(seen) == {0, 1, 2}
    assert counts[0] == counts[1] == 2  # ceil(3/2) with wrap-around pad


def test_make_loader_factory(davis_tree):
    loader = make_loader(
        "davis", num_clip_frames=2, batch_size=2, root=davis_tree,
        decode_size=32, shuffle=True, drop_last=False,
    )
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0][0].shape[0] == 2


def test_diff_annotation_directories(davis_tree):
    assert diff_annotation_data_directories(
        os.path.join(davis_tree, "JPEGImages"), os.path.join(davis_tree, "Annotations")
    ) == {}


def test_train_val_split(davis_tree):
    train, val = train_val_split(os.path.join(davis_tree, "JPEGImages", "480p"), 1 / 3)
    assert len(train) == 2 and len(val) == 1
    assert set(train) | set(val) == {"video0", "video1", "video2"}


def test_palette_annotation_decode_preserves_ids(tmp_path):
    """DAVIS/YTVOS annotations are palette-indexed PNGs (pixel value ==
    object id). The decoder must return the raw indices — cv2 alone would
    expand the palette to colors (object 1 → (128,0,0) → id 128, objects
    2/3 → 0), silently corrupting multi-object ground truth."""
    from PIL import Image

    from timetuning_tpu.data.datasets import _decode_annotation

    ann = np.zeros((16, 16), np.uint8)
    ann[2:6, 2:6] = 1
    ann[8:12, 8:12] = 2
    ann[12:15, 2:5] = 3
    im = Image.fromarray(ann, mode="P")
    # the DAVIS palette: object 1 red-ish, 2 green-ish, 3 blue-ish
    im.putpalette([0, 0, 0, 128, 0, 0, 0, 128, 0, 0, 0, 128] + [0] * 756)
    p = str(tmp_path / "ann.png")
    im.save(p)

    out = _decode_annotation(p, 16)
    np.testing.assert_array_equal(out, ann)
    assert set(np.unique(out)) == {0, 1, 2, 3}


def test_pascal_palette_mask_decode(tmp_path):
    """VOC SegmentationClass palette masks: class ids + the 255 ignore
    border must survive decoding (cv2 grayscale would give luma ~38/~220)."""
    from PIL import Image

    from timetuning_tpu.data.pascal import PascalVOCDataset

    root = tmp_path / "voc"
    (root / "images").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    (root / "sets").mkdir()
    img = np.zeros((16, 16, 3), np.uint8)
    mask = np.zeros((16, 16), np.uint8)
    mask[4:10, 4:10] = 1
    mask[0, :] = 255  # VOC ignore border
    im = Image.fromarray(mask, mode="P")
    pal = [0] * 768
    pal[3:6] = [128, 0, 0]
    pal[765:768] = [224, 224, 192]
    im.putpalette(pal)
    cv2.imwrite(str(root / "images" / "a.jpg"), img)
    im.save(str(root / "SegmentationClass" / "a.png"))
    (root / "sets" / "val.txt").write_text("a\n")

    ds = PascalVOCDataset(str(root), "val")
    _, got = ds[0]
    np.testing.assert_array_equal(got, mask)
    assert 255 in np.unique(got)  # ignore index must be matchable


def test_loader_worker_exception_propagates(davis_tree):
    """A decode failure in a worker thread must raise in the consumer, not
    hang the iterator forever on the missing batch."""
    ds = VideoDataset(
        frames_root=os.path.join(davis_tree, "JPEGImages"),
        annotations_root=os.path.join(davis_tree, "Annotations"),
        num_frames=2,
        decode_size=32,
    )

    class Boom(Exception):
        pass

    class BadDataset:
        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            if i == 1:
                raise Boom("corrupt frame")
            return ds[i]

    loader = ClipLoader(BadDataset(), batch_size=1, shuffle=False,
                        drop_last=False, num_workers=2)
    with pytest.raises(Boom):
        for _ in loader:
            pass


def test_pack_path_missing_pack_errors_clearly(tmp_path):
    """kinetics pack_path is supported (PackedVideoDataset with an empty
    annotation tree — full round-trip in test_native); pointing it at a
    nonexistent pack must fail up front, not mid-epoch."""
    (tmp_path / "v").mkdir()
    cv2.imwrite(str(tmp_path / "v" / "0.jpg"), np.zeros((8, 8, 3), np.uint8))
    with pytest.raises(FileNotFoundError):
        make_loader(
            "kinetics", num_clip_frames=2, batch_size=1, root=str(tmp_path),
            pack_path=str(tmp_path / "x.pack"),
        )


def test_numeric_frame_ordering(tmp_path):
    """Unpadded frame names (1.jpg .. 12.jpg) must order temporally, not
    lexicographically (1, 10, 11, 12, 2, ...)."""
    from timetuning_tpu.data.datasets import build_dataset_tree

    vdir = tmp_path / "v"
    vdir.mkdir()
    for i in range(1, 13):
        cv2.imwrite(str(vdir / f"{i}.jpg"),
                    np.full((8, 8, 3), i, np.uint8))
    tree = build_dataset_tree(str(tmp_path))
    names = [os.path.basename(p) for p in tree[str(vdir)]]
    assert names == [f"{i}.jpg" for i in range(1, 13)]


def test_clip_loader_more_ranks_than_items(davis_tree):
    """n < world_size: cyclic repeat must still give every rank exactly one
    index (a single wrap-around slice can't cover this case)."""
    ds = VideoDataset(
        frames_root=os.path.join(davis_tree, "JPEGImages"),
        annotations_root=os.path.join(davis_tree, "Annotations"),
        num_frames=2,
        decode_size=32,
    )
    counts = []
    for rank in range(8):  # 3 videos over 8 ranks
        loader = ClipLoader(ds, batch_size=1, shuffle=False, world_size=8,
                            rank=rank, drop_last=False, num_workers=1)
        idx = loader._indices()
        assert len(idx) == 1
        counts.append(idx[0])
    assert set(counts) == {0, 1, 2}  # all items still covered


def test_clip_loader_early_exit_releases_workers(davis_tree):
    """The pool is PERSISTENT by design (one spawn per loader lifetime, not
    per epoch): early exits must not grow it, repeated iterations must not
    spawn more threads, and close() must terminate it."""
    import threading
    import time as _time

    ds = VideoDataset(
        frames_root=os.path.join(davis_tree, "JPEGImages"),
        annotations_root=os.path.join(davis_tree, "Annotations"),
        num_frames=2,
        decode_size=32,
    )
    before = threading.active_count()
    loader = ClipLoader(ds, batch_size=1, shuffle=False,
                        drop_last=False, num_workers=2, prefetch=1)
    for ep in range(5):
        loader.set_epoch(ep)
        for batch in loader:
            break  # early exit with batches still queued
    assert threading.active_count() <= before + 2, "pool grew beyond size"
    # a completed pass after early exits must still yield every batch
    loader.set_epoch(9)
    assert sum(1 for _ in loader) == len(loader)
    loader.close()
    deadline = _time.time() + 5.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before, (
        f"{threading.active_count() - before} threads survive close()"
    )


def test_persistent_pool_speculation_matches_fresh_loader(davis_tree):
    """Cross-epoch speculation must be invisible: a long-lived loader's
    yields over epochs 0..3 equal a fresh loader's at each epoch, including
    after an early break and a skip_next_batches fast-forward."""
    ds = VideoDataset(
        frames_root=os.path.join(davis_tree, "JPEGImages"),
        annotations_root=os.path.join(davis_tree, "Annotations"),
        num_frames=2, decode_size=32,
    )
    live = ClipLoader(ds, batch_size=1, shuffle=True, drop_last=False,
                      num_workers=2, prefetch=2)
    for epoch in range(4):
        live.set_epoch(epoch)
        fresh = ClipLoader(ds, batch_size=1, shuffle=True, drop_last=False,
                           num_workers=1, prefetch=2)
        fresh.set_epoch(epoch)
        if epoch == 1:     # early break mid-epoch; speculation must purge
            for b in live:
                break
            live.set_epoch(epoch)
        if epoch == 2:     # resume-style fast-forward
            live.skip_next_batches(1)
            fresh.skip_next_batches(1)
        got = [b for b in live]
        want = [b for b in fresh]
        fresh.close()
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g[0], w[0])
            np.testing.assert_array_equal(g[2], w[2])
    live.close()


class _EpochItemDataset:
    """Duck-typed dataset whose item content encodes (epoch, index);
    decode takes ``delay`` seconds. ``with_get_item=False`` models an
    external dataset with set_epoch-dependent sampling but no epoch-
    explicit accessor."""

    def __init__(self, n, delay=0.0, with_get_item=True):
        self.n, self.delay = n, delay
        self._epoch = 0
        if not with_get_item:
            self.get_item = None  # getattr(..., "get_item", None) -> None

    def __len__(self):
        return self.n

    def set_epoch(self, epoch):
        self._epoch = epoch

    def _make(self, i, epoch):
        if self.delay:
            time.sleep(self.delay)
        return {
            "frames": np.full((1, 2, 4, 4, 3), epoch * 100 + i, np.uint8),
            "annotations": np.zeros((1, 2, 4, 4), np.uint8),
            "label": i,
        }

    def __getitem__(self, i):
        return self._make(i, self._epoch)

    def get_item(self, i, epoch=None):
        return self._make(i, self._epoch if epoch is None else epoch)


def test_reiterate_after_early_break_no_deadlock():
    """Early break leaves later-key tasks enqueued; re-iterating the SAME
    epoch must feed the head key anyway (a one-shot capacity budget counted
    those stale tasks and fed nothing — permanent hang)."""
    import threading

    ds = _EpochItemDataset(12, delay=0.15)
    loader = ClipLoader(ds, batch_size=1, shuffle=False, drop_last=False,
                        num_workers=2, prefetch=2)
    loader.set_epoch(1)
    for _ in loader:
        break                     # abort with the pipeline full
    loader.set_epoch(1)

    got = []

    def consume():
        got.extend(int(b[0][0, 0, 0, 0, 0]) for b in loader)

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=30)
    assert not t.is_alive(), "re-iteration deadlocked"
    assert got == [100 + i for i in range(12)]
    loader.close()


def test_speculation_disabled_without_epoch_explicit_accessor():
    """A dataset with set_epoch-dependent __getitem__ but no get_item must
    NOT be speculated: epoch e+1 batches would be silently decoded under
    epoch e's sampling state."""
    ds = _EpochItemDataset(4, with_get_item=False)
    loader = ClipLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                        num_workers=2, prefetch=2, lookahead=2)
    assert not loader._speculation_safe()
    for epoch in range(3):
        loader.set_epoch(epoch)
        vals = [b[0][:, 0, 0, 0, 0] // 100 for b in loader]
        time.sleep(0.2)           # let any (buggy) speculation land
        for v in vals:
            assert (v == epoch).all(), f"epoch {epoch} got {v}"
    loader.close()


def test_concurrent_iterators_both_complete(davis_tree):
    """Two live iterators over one loader (zip(loader, loader)) must both
    yield the full epoch — the second falls back to synchronous decode
    instead of stealing the pooled pass's batches."""
    ds = VideoDataset(
        frames_root=os.path.join(davis_tree, "JPEGImages"),
        annotations_root=os.path.join(davis_tree, "Annotations"),
        num_frames=2, decode_size=32,
    )
    loader = ClipLoader(ds, batch_size=1, shuffle=True, drop_last=False,
                        num_workers=2, prefetch=2)
    pairs = list(zip(loader, loader))
    assert len(pairs) == len(loader)
    for a, b in pairs:
        np.testing.assert_array_equal(a[0], b[0])
    # and the pool still serves a normal pass afterwards
    assert sum(1 for _ in loader) == len(loader)
    loader.close()


def test_load_annotations_false_skips_decode(davis_tree):
    """load_annotations=False: items carry a [C, F, 1, 1] placeholder (no
    PNG decode) while frames/sizes/means are unchanged."""
    kw = dict(
        frames_root=os.path.join(davis_tree, "JPEGImages"),
        annotations_root=os.path.join(davis_tree, "Annotations"),
        num_frames=2, decode_size=32,
    )
    full = VideoDataset(**kw)[0]
    slim = VideoDataset(load_annotations=False, **kw)[0]
    assert slim["annotations"].shape == (1, 2, 1, 1)
    assert full["annotations"].shape == (1, 2, 32, 32)
    np.testing.assert_array_equal(slim["frames"], full["frames"])
    np.testing.assert_array_equal(slim["gray_means"], full["gray_means"])


def test_orig_sizes_flow_through_loader(tmp_path):
    """Items report the native pre-decode frame size and the loader batches
    them as Batch.orig_sizes (feeds the aspect-preserving train resize)."""
    root = tmp_path / "JPEGImages"
    for v, (h, w) in enumerate([(30, 50), (40, 20)]):
        vdir = root / f"v{v}"
        vdir.mkdir(parents=True)
        for f in range(3):
            cv2.imwrite(str(vdir / f"{f:05d}.jpg"),
                        np.zeros((h, w, 3), np.uint8))
    ds = VideoDataset(frames_root=str(root), num_frames=2, decode_size=16)
    assert ds.orig_size(0) == (30, 50)
    assert ds.orig_size(1) == (40, 20)
    np.testing.assert_array_equal(ds[1]["orig_size"], [40, 20])

    loader = ClipLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                        num_workers=1)
    batch = next(iter(loader))
    frames, annots, labels = batch  # 3-tuple unpacking still works
    assert frames.shape == (2, 2, 16, 16, 3)
    np.testing.assert_array_equal(batch.orig_sizes, [[30, 50], [40, 20]])


def test_fast_decode_reduced_jpeg(tmp_path):
    """fast_decode: JPEG DCT-domain reduced decode kicks in when the source
    is >=2x the decode buffer and stays OFF (bit-identical) below it;
    reduced output stays close to the faithful full-decode path."""
    import cv2

    from timetuning_tpu.data.datasets import VideoDataset

    yy, xx = np.mgrid[0:512, 0:640]
    big = np.stack([128 + 100 * np.sin(yy / 40),
                    128 + 100 * np.cos(xx / 30),
                    np.full_like(yy, 90)], -1).astype(np.uint8)
    small = big[:200, :320]
    for name, img in (("big", big), ("small", small)):
        d = tmp_path / name / "JPEGImages" / "v0"
        d.mkdir(parents=True)
        for f in range(4):
            cv2.imwrite(str(d / f"{f:05d}.jpg"), img,
                        [cv2.IMWRITE_JPEG_QUALITY, 92])

    def frames(name, fast):
        ds = VideoDataset(
            frames_root=str(tmp_path / name / "JPEGImages"),
            num_frames=2, decode_size=256, fast_decode=fast,
        )
        return ds[0]["frames"]

    full, fast = frames("big", False), frames("big", True)
    assert fast.shape == full.shape
    # different downsampling, same content
    diff = np.abs(fast.astype(np.float32) - full.astype(np.float32)).mean()
    assert 0 < diff < 4.0, diff
    # below the 2x threshold the flag is a no-op: identical bytes
    np.testing.assert_array_equal(frames("small", True),
                                  frames("small", False))


def test_fast_decode_mixed_resolution_video(tmp_path):
    """A video whose later frames are SMALLER than its first frame: the
    per-video 1/k reduction (picked from the first frame's header) must not
    decode those frames below the buffer and upscale — they re-decode at
    full resolution, matching the faithful path exactly."""
    import cv2

    from timetuning_tpu.data.datasets import VideoDataset

    yy, xx = np.mgrid[0:512, 0:640]
    big = np.stack([128 + 100 * np.sin(yy / 40),
                    128 + 100 * np.cos(xx / 30),
                    np.full_like(yy, 90)], -1).astype(np.uint8)
    small = big[:300, :360]  # short side 300 < 2*256: no valid reduction
    d = tmp_path / "JPEGImages" / "v0"
    d.mkdir(parents=True)
    for f in range(4):
        img = big if f == 0 else small
        cv2.imwrite(str(d / f"{f:05d}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 92])

    def frames(fast):
        from timetuning_tpu.data.datasets import SamplingMode

        ds = VideoDataset(
            frames_root=str(tmp_path / "JPEGImages"), num_frames=4,
            decode_size=256, fast_decode=fast,
            sampling_mode=SamplingMode.FULL,
        )
        return ds[0]["frames"]

    full, fast = frames(False), frames(True)
    # the small frames (indices 1..3) must be bit-identical to the
    # faithful path — the reduced decode would have undershot 256
    np.testing.assert_array_equal(fast[0, 1:], full[0, 1:])


def test_pack_build_honors_fast_decode(tmp_path):
    """build_clip_pack decodes through the same _decode_frame path as the
    live loader, so dataset.fast_decode applies to the one-time build."""
    import cv2

    from timetuning_tpu.data.datasets import VideoDataset
    from timetuning_tpu.native import ClipPack, build_clip_pack

    yy, xx = np.mgrid[0:512, 0:640]
    big = np.stack([128 + 100 * np.sin(yy / 40),
                    128 + 100 * np.cos(xx / 30),
                    np.full_like(yy, 90)], -1).astype(np.uint8)
    d = tmp_path / "JPEGImages" / "v0"
    d.mkdir(parents=True)
    for f in range(3):
        cv2.imwrite(str(d / f"{f:05d}.jpg"), big,
                    [cv2.IMWRITE_JPEG_QUALITY, 92])

    packs = {}
    for fast in (False, True):
        ds = VideoDataset(frames_root=str(tmp_path / "JPEGImages"),
                          num_frames=2, decode_size=256, fast_decode=fast)
        p = str(tmp_path / f"pack_{fast}.clippack")
        index = build_clip_pack(ds, p)
        assert index["v0"][1:4] == (3, 512, 640)  # n_frames + native dims
        assert len(index["v0"][4]) == 3           # per-frame native means
        packs[fast] = ClipPack(p).gather(np.arange(3))
    # reduced-DCT decode differs from full decode + bilinear, but only
    # slightly — proving the flag reached the build
    diff = np.abs(packs[True].astype(np.float32)
                  - packs[False].astype(np.float32)).mean()
    assert 0 < diff < 4.0, diff
    # the faithful build matches the live loader's faithful decode
    from timetuning_tpu.data.datasets import SamplingMode

    ds = VideoDataset(frames_root=str(tmp_path / "JPEGImages"),
                      num_frames=3, decode_size=256,
                      sampling_mode=SamplingMode.FULL)
    np.testing.assert_array_equal(packs[False][:3], ds[0]["frames"][0])


def test_davis_val_imagesets_filter(tmp_path):
    """davis_val on a STANDARD DAVIS root (train+val together) restricts to
    ImageSets/2017/val.txt — otherwise train videos would contaminate the
    val metric. Roots without ImageSets keep the reference's whole-tree
    contract (pre-split val-only trees)."""
    import cv2

    from timetuning_tpu.data.loader import make_loader

    root = tmp_path / "davis"
    for v in ("train_a", "train_b", "val_a"):
        for sub in ("JPEGImages/480p", "Annotations/480p"):
            d = root / sub / v
            d.mkdir(parents=True)
            for f in range(3):
                ext, img = (
                    (".jpg", np.zeros((16, 16, 3), np.uint8))
                    if "JPEG" in sub else (".png", np.zeros((16, 16), np.uint8))
                )
                cv2.imwrite(str(d / f"{f:05d}{ext}"), img)
    (root / "ImageSets" / "2017").mkdir(parents=True)
    (root / "ImageSets" / "2017" / "val.txt").write_text("val_a\n")

    val = make_loader("davis_val", num_clip_frames=2, batch_size=1,
                      root=str(root), decode_size=16, num_workers=1)
    assert len(val.dataset) == 1
    assert val.dataset.video_name(0) == "val_a"
    train = make_loader("davis", num_clip_frames=2, batch_size=1,
                        root=str(root), decode_size=16, num_workers=1)
    assert len(train.dataset) == 3  # train name keeps whole-tree semantics


def test_mismatched_annotation_names_raise(tmp_path):
    """A stray frame-bearing dir must not silently shift every video onto
    another video's annotations (pairing is positional)."""
    import cv2

    import pytest

    from timetuning_tpu.data.datasets import VideoDataset

    root = tmp_path
    for v in ("v0", "v1"):
        d = root / "JPEGImages" / v
        d.mkdir(parents=True)
        cv2.imwrite(str(d / "00000.jpg"), np.zeros((8, 8, 3), np.uint8))
    for v in ("v0", "zz_other"):   # same COUNT, different names
        d = root / "Annotations" / v
        d.mkdir(parents=True)
        cv2.imwrite(str(d / "00000.png"), np.zeros((8, 8), np.uint8))
    with pytest.raises(ValueError, match="do not align"):
        VideoDataset(frames_root=str(root / "JPEGImages"),
                     annotations_root=str(root / "Annotations"),
                     num_frames=1, decode_size=8)


def test_empty_dataset_raises(tmp_path):
    import pytest

    from timetuning_tpu.data.loader import make_loader

    (tmp_path / "JPEGImages").mkdir()
    with pytest.raises(ValueError, match="no videos"):
        make_loader("davis", num_clip_frames=2, batch_size=1,
                    root=str(tmp_path), num_workers=1)


def test_num_clips_merge_into_batch(tmp_path):
    """num_clips > 1 merges into the batch axis ([B*C, F, ...]) instead of
    crashing the downstream 4-D augment contract."""
    import cv2

    from timetuning_tpu.data.loader import make_loader

    for v in range(2):
        d = tmp_path / "JPEGImages" / f"v{v}"
        d.mkdir(parents=True)
        for f in range(6):
            cv2.imwrite(str(d / f"{f:05d}.jpg"),
                        np.full((16, 16, 3), v * 50, np.uint8))
    ld = make_loader("davis", num_clip_frames=2, batch_size=2,
                     root=str(tmp_path), decode_size=16, num_clips=3,
                     num_workers=1, shuffle=False)
    frames, annots, labels = next(iter(ld))
    assert frames.shape == (6, 2, 16, 16, 3)   # 2 videos x 3 clips
    assert annots.shape == (6, 2, 16, 16)
    np.testing.assert_array_equal(labels, [0, 0, 0, 1, 1, 1])


def test_grayscale_and_16bit_frames_decode(tmp_path):
    """Grayscale and 16-bit sources decode into the uint8 RGB buffer
    (previously a broadcast crash / modulo wrap)."""
    import cv2

    from timetuning_tpu.data.datasets import VideoDataset

    d = tmp_path / "JPEGImages" / "v0"
    d.mkdir(parents=True)
    gray = np.full((16, 16), 77, np.uint8)
    cv2.imwrite(str(d / "00000.jpg"), gray)            # grayscale jpg... wait cv2 writes 3ch
    cv2.imwrite(str(d / "00001.png"), gray)            # grayscale png
    cv2.imwrite(str(d / "00002.png"),
                np.full((16, 16), 300 * 256, np.uint16))  # 16-bit png
    from timetuning_tpu.data.datasets import SamplingMode

    ds = VideoDataset(frames_root=str(tmp_path / "JPEGImages"),
                      num_frames=3, decode_size=16,
                      sampling_mode=SamplingMode.FULL)
    frames = ds[0]["frames"]
    assert frames.shape == (1, 3, 16, 16, 3)
    assert frames.dtype == np.uint8
