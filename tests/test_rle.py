# test_rle.py — lossless RLE transfer codecs (ops/rle.py).
import numpy as np
import jax.numpy as jnp

from reasoning_image_generation_tpu.ops.rle import (
    pack_frame_rle, pack_batch_rle, unpack_frame_rle, default_budget,
    pack_frame_rle2, pack_batch_rle2, unpack_frame_rle2, U16_RUN)


def _img(seed=0, n_rects=6, H=64, W=64):
    rng = np.random.default_rng(seed)
    img = np.full((H, W, 3), 255, np.uint8)
    for _ in range(n_rects):
        y, x = rng.integers(0, H - 8), rng.integers(0, W - 8)
        h, w = rng.integers(4, 16), rng.integers(4, 16)
        img[y:y + h, x:x + w] = rng.integers(0, 255, 3)
    return img


def test_roundtrip_exact():
    img = _img(0)
    starts, colors, count = pack_frame_rle(jnp.asarray(img), 2048)
    back = unpack_frame_rle(np.asarray(starts), np.asarray(colors),
                            int(count), (64, 64))
    np.testing.assert_array_equal(back, img)


def test_roundtrip_all_background():
    img = np.full((32, 32, 3), 255, np.uint8)
    starts, colors, count = pack_frame_rle(jnp.asarray(img), 64)
    assert int(count) == 1  # one run covering the whole canvas
    back = unpack_frame_rle(np.asarray(starts), np.asarray(colors),
                            int(count), (32, 32))
    np.testing.assert_array_equal(back, img)


def test_overflow_detected():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)  # ~1 run per pixel
    starts, colors, count = pack_frame_rle(jnp.asarray(img), 128)
    assert int(count) > 128
    try:
        unpack_frame_rle(np.asarray(starts), np.asarray(colors), int(count),
                         (64, 64))
        assert False, "expected OverflowError"
    except OverflowError:
        pass


def test_pack_batch_leading_dims():
    imgs = np.stack([np.stack([_img(i * 3 + j) for j in range(3)])
                     for i in range(2)])  # [2, 3, H, W, 3]
    starts, colors, count = pack_batch_rle(jnp.asarray(imgs), 2048)
    assert starts.shape[:2] == (2, 3) and colors.shape[:2] == (2, 3)
    for i in range(2):
        for j in range(3):
            back = unpack_frame_rle(np.asarray(starts[i, j]),
                                    np.asarray(colors[i, j]),
                                    int(count[i, j]), (64, 64))
            np.testing.assert_array_equal(back, imgs[i, j])


def test_default_budget_monotone():
    assert default_budget(512, 512) == 512 * 512 // 24
    assert default_budget(8, 8) == 1024  # floor


# ---- v2 codec: u16 length + u8 RGB (5 bytes/run) ----

def test_rle2_roundtrip_exact():
    img = _img(0)
    ln, co, count = pack_frame_rle2(jnp.asarray(img), 2048)
    assert ln.dtype == jnp.uint16 and co.dtype == jnp.uint8
    back = unpack_frame_rle2(np.asarray(ln), np.asarray(co),
                             int(count), (64, 64))
    np.testing.assert_array_equal(back, img)


def test_rle2_long_run_split():
    # a uniform 300x512 frame has one 153600-px run; the encoder must
    # split it at U16_RUN boundaries so every length fits u16
    img = np.full((300, 512, 3), 7, np.uint8)
    ln, co, count = pack_frame_rle2(jnp.asarray(img), 64)
    n = 300 * 512
    assert int(count) == -(-n // U16_RUN)
    ln, co = np.asarray(ln), np.asarray(co)
    assert ln[:int(count)].sum() == n
    back = unpack_frame_rle2(ln, co, int(count), (300, 512))
    np.testing.assert_array_equal(back, img)


def test_rle2_overflow_detected():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    ln, co, count = pack_frame_rle2(jnp.asarray(img), 128)
    assert int(count) > 128
    try:
        unpack_frame_rle2(np.asarray(ln), np.asarray(co), int(count),
                          (64, 64))
        assert False, "expected OverflowError"
    except OverflowError:
        pass


def test_rle2_truncated_stream_detected():
    # a stream sliced below its count must fail the length-sum check, not
    # silently produce a short image
    img = _img(2)
    ln, co, count = pack_frame_rle2(jnp.asarray(img), 2048)
    ln, co = np.asarray(ln).copy(), np.asarray(co)
    ln[int(count) - 1] = 0  # corrupt: total no longer H*W
    try:
        unpack_frame_rle2(ln, co, int(count), (64, 64))
        assert False, "expected OverflowError"
    except OverflowError:
        pass


def test_rle2_batch_matches_frame():
    imgs = np.stack([_img(i) for i in range(4)])
    ln, co, count = pack_batch_rle2(jnp.asarray(imgs), 2048)
    for i in range(4):
        back = unpack_frame_rle2(np.asarray(ln[i]), np.asarray(co[i]),
                                 int(count[i]), (64, 64))
        np.testing.assert_array_equal(back, imgs[i])


def test_generator_end_to_end_with_rle(tmp_path):
    # transfer_codec defaults to 'rle'; the full generator path must
    # reconstruct frames bit-exactly vs a raw-transfer run
    from reasoning_image_generation_tpu.utils.config import GenConfig
    from reasoning_image_generation_tpu.models.rpm.generator import RPMGeneratorTPU
    import cv2, os
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    metas = {}
    for out, sparse in ((out_a, True), (out_b, False)):
        cfg = GenConfig(out_dir=out, seed=2, batch_size=2,
                        canvas_size=(128, 128), sparse_transfer=sparse)
        gen = RPMGeneratorTPU(cfg)
        metas[out] = gen.generate(2)
        gen.close()
    for ma, mb in zip(metas[out_a], metas[out_b]):
        ia = cv2.imread(os.path.join(ma["sample_dir"], "state_0.png"))
        ib = cv2.imread(os.path.join(mb["sample_dir"], "state_0.png"))
        assert ia is not None and (ia < 250).any()
        np.testing.assert_array_equal(ia, ib)
        ga = cv2.imread(ma["grid_path"])
        gb = cv2.imread(mb["grid_path"])
        np.testing.assert_array_equal(ga, gb)


# ---- rle3 (batch-compacted palette codec) ----

def test_rle3_roundtrip_exact_all_frames():
    from reasoning_image_generation_tpu.ops.rle import (
        pack_batch_rle3, Rle3Frames)
    imgs = np.stack([_img(i) for i in range(6)]).reshape(2, 3, 64, 64, 3)
    cap = 2048
    packed = pack_batch_rle3(jnp.asarray(imgs), cap)
    fr = Rle3Frames([np.asarray(a) for a in packed], cap)
    assert fr.overflow_indices(6).size == 0
    flat = imgs.reshape(-1, 64, 64, 3)
    for i in range(6):
        np.testing.assert_array_equal(fr.unpack(i, (64, 64)), flat[i])


def test_rle3_matches_rle2_stream():
    """Per-frame (lengths, rgb) reconstructed from the compacted palette
    stream must equal the rle2 stream bit-for-bit (the C PNG encoder
    consumes the converted stream, so this IS PNG parity)."""
    from reasoning_image_generation_tpu.ops.rle import (
        pack_batch_rle2, compact_rle3, Rle3Frames)
    imgs = np.stack([_img(10 + i, n_rects=10) for i in range(4)])
    cap = 2048
    ln2, co2, cnt2 = pack_batch_rle2(jnp.asarray(imgs), cap)
    fr = Rle3Frames([np.asarray(a)
                     for a in compact_rle3(ln2, co2, cnt2)], cap)
    ln2, co2, cnt2 = np.asarray(ln2), np.asarray(co2), np.asarray(cnt2)
    for i in range(4):
        ln, rgb = fr.frame(i)
        c = int(cnt2[i])
        np.testing.assert_array_equal(ln, ln2[i, :c])
        np.testing.assert_array_equal(rgb, co2[i, :c])


def test_rle3_escape_path_exact():
    """Frames with >255 distinct run colors keep exact decode through the
    escape stream (no raw-frame fallback)."""
    from reasoning_image_generation_tpu.ops.rle import (
        pack_batch_rle3, Rle3Frames, PAL_K)
    img = _img(3)
    # stripe of ~640 distinct single-run colors
    img[54:64, :, 0] = (np.arange(640) % 256).astype(np.uint8).reshape(10, 64)
    img[54:64, :, 1] = np.repeat(np.arange(10, dtype=np.uint8) * 7,
                                 64).reshape(10, 64)
    packed = pack_batch_rle3(jnp.asarray(img[None]), 4096)
    fr = Rle3Frames([np.asarray(a) for a in packed], 4096)
    assert int(fr.nc[0]) > PAL_K and int(fr.ec[0]) > 0
    assert fr.overflow_indices(1).size == 0
    np.testing.assert_array_equal(fr.unpack(0, (64, 64)), img)


def test_rle3_truncation_overflow_detected():
    """A shrunken stream axis (adaptive tier too small) flags the
    truncated frames instead of decoding garbage."""
    from reasoning_image_generation_tpu.ops.rle import (
        pack_batch_rle3, Rle3Frames)
    imgs = np.stack([_img(20 + i, n_rects=12) for i in range(4)])
    cap = 2048
    packed = [np.asarray(a) for a in pack_batch_rle3(jnp.asarray(imgs), cap)]
    total = int(packed[4].sum())
    cut = total - int(packed[4][-1]) // 2    # truncate into the last frame
    packed[0] = packed[0][:cut]
    packed[1] = packed[1][:cut]
    fr = Rle3Frames(packed, cap)
    over = fr.overflow_indices(4)
    assert over.tolist() == [3]
    for i in range(3):
        np.testing.assert_array_equal(fr.unpack(i, (64, 64)), imgs[i])
    try:
        fr.unpack(3, (64, 64))
        raise AssertionError("expected OverflowError")
    except OverflowError:
        pass


def test_rle3_escape_burst_does_not_cascade():
    """One >255-color frame that blows a shrunk ESCAPE stream must flag
    only escape-carrying frames — escape-free frames after it still
    decode exactly (regression: cumulative offsets past the cap used to
    mark the entire batch tail as overflowed, turning one burst frame
    into dozens of raw 786 KB fallback fetches)."""
    from reasoning_image_generation_tpu.ops.rle import (
        pack_batch_rle3, Rle3Frames, PAL_K)
    imgs = np.stack([_img(40 + i) for i in range(4)])
    # frame 1 gets ~640 distinct single-run colors -> hundreds of escapes
    imgs[1, 54:64, :, 0] = (np.arange(640) % 256).astype(
        np.uint8).reshape(10, 64)
    imgs[1, 54:64, :, 1] = np.repeat(np.arange(10, dtype=np.uint8) * 7,
                                     64).reshape(10, 64)
    cap = 4096
    packed = [np.asarray(a) for a in pack_batch_rle3(jnp.asarray(imgs), cap)]
    nc, ec = packed[5], packed[6]
    assert int(nc[1]) > PAL_K and int(ec[1]) > 0
    assert all(int(e) == 0 for e in (ec[0], ec[2], ec[3]))
    # shrink the escape stream to LESS than frame 1's burst needs
    packed[3] = packed[3][:int(ec[1]) // 2]
    fr = Rle3Frames(packed, cap)
    assert fr.overflow_indices(4).tolist() == [1]
    for i in (0, 2, 3):
        np.testing.assert_array_equal(fr.unpack(i, (64, 64)), imgs[i])


def test_rle3_write_png_parity(tmp_path):
    """write_png_rle3 produces the same pixels as raw write_png."""
    import cv2
    from reasoning_image_generation_tpu.ops.rle import (
        pack_batch_rle3, Rle3Frames)
    from reasoning_image_generation_tpu.io.png import (write_png,
                                                       write_png_rle3)
    img = _img(7, n_rects=9)
    packed = pack_batch_rle3(jnp.asarray(img[None]), 2048)
    fr = Rle3Frames([np.asarray(a) for a in packed], 2048)
    p1 = str(tmp_path / "a.png")
    p2 = str(tmp_path / "b.png")
    write_png_rle3(p1, fr, 0, 64, 64)
    write_png(p2, img)
    np.testing.assert_array_equal(cv2.imread(p1), cv2.imread(p2))


# ---- rle3d (inter-frame delta codec) ----

def _seq(seed=0, L=4, H=64, W=64):
    """Frame sequence where each frame moves one small rect vs its
    predecessor (the RPM state-sequence shape)."""
    rng = np.random.default_rng(seed)
    base = _img(seed, n_rects=4, H=H, W=W)
    frames = [base]
    for t in range(1, L):
        f = frames[-1].copy()
        y, x = rng.integers(0, H - 12), rng.integers(0, W - 12)
        f[y:y + 10, x:x + 10] = rng.integers(0, 255, 3)
        frames.append(f)
    return np.stack(frames)


def test_rle3d_roundtrip_exact_chain():
    from reasoning_image_generation_tpu.ops.rle import (
        pack_batch_rle2_delta, compact_rle3d, Rle3Frames)
    seq = _seq(3, L=5)
    cap = 2048
    bases = np.concatenate([255 - seq[:1], seq[:-1]])  # keyframe trick
    ln, co, cp, cnt = pack_batch_rle2_delta(
        jnp.asarray(seq), jnp.asarray(bases), cap)
    packed = compact_rle3d(ln, co, cp, cnt)
    fr = Rle3Frames([np.asarray(a) for a in packed], cap, delta=True)
    assert fr.overflow_indices(5).size == 0
    prev = np.zeros_like(seq[0])
    for t in range(5):
        got = fr.unpack_delta(t, prev, (64, 64))
        np.testing.assert_array_equal(got, seq[t])
        prev = got


def test_rle3d_far_fewer_runs_than_rle3():
    """Delta frames of a mostly-unchanged sequence must carry far fewer
    runs than independent encoding (the whole point of the codec)."""
    from reasoning_image_generation_tpu.ops.rle import (
        pack_batch_rle2, pack_batch_rle2_delta)
    seq = _seq(7, L=4)
    cap = 2048
    _, _, cnt_full = pack_batch_rle2(jnp.asarray(seq), cap)
    bases = np.concatenate([255 - seq[:1], seq[:-1]])
    _, _, _, cnt_d = pack_batch_rle2_delta(
        jnp.asarray(seq), jnp.asarray(bases), cap)
    full = np.asarray(cnt_full)[1:].sum()
    delta = np.asarray(cnt_d)[1:].sum()
    assert delta < full * 0.5, (full, delta)
    # keyframe (vs inverted base) encodes everything
    assert int(np.asarray(cnt_d)[0]) == int(np.asarray(cnt_full)[0])


def test_rle3d_escape_and_copy_mix():
    """A delta frame whose changed region carries >254 distinct colors
    exercises copy runs + palette escapes together."""
    from reasoning_image_generation_tpu.ops.rle import (
        pack_batch_rle2_delta, compact_rle3d, Rle3Frames)
    rng = np.random.default_rng(11)
    base = _img(5, n_rects=3)
    f = base.copy()
    f[20:40, :] = rng.integers(0, 255, (20, 64, 3), np.uint8)  # noise band
    seq = np.stack([base, f])
    bases = np.stack([255 - base, base])
    cap = 4096
    ln, co, cp, cnt = pack_batch_rle2_delta(
        jnp.asarray(seq), jnp.asarray(bases), cap)
    packed = compact_rle3d(ln, co, cp, cnt)
    assert int(np.asarray(packed[5])[1]) > 254  # distinct colors
    assert int(np.asarray(packed[6])[1]) > 0    # escapes used
    fr = Rle3Frames([np.asarray(a) for a in packed], cap, delta=True)
    np.testing.assert_array_equal(
        fr.unpack_delta(0, np.zeros_like(base), (64, 64)), base)
    np.testing.assert_array_equal(fr.unpack_delta(1, base, (64, 64)), f)


def test_rle3d_identical_frame_single_copy_run():
    from reasoning_image_generation_tpu.ops.rle import (
        pack_batch_rle2_delta)
    img = _img(9)
    ln, co, cp, cnt = pack_batch_rle2_delta(
        jnp.asarray(img[None]), jnp.asarray(img[None]), 256)
    # 64*64 = 4096 px < 65535: one copy run covers the whole frame
    assert int(np.asarray(cnt)[0]) == 1
    assert bool(np.asarray(cp)[0, 0])


def test_generator_end_to_end_rle3d_matches_rle3(tmp_path):
    """Full export under the delta codec must write byte-identical PNGs
    and metadata to the independent-frame rle3 codec (both lossless)."""
    import os
    import dataclasses
    from reasoning_image_generation_tpu.utils.config import GenConfig
    from reasoning_image_generation_tpu.models.rpm.generator import (
        RPMGeneratorTPU)
    outs = {}
    for codec in ("rle3", "rle3d"):
        out = str(tmp_path / codec)
        cfg = GenConfig(out_dir=out, seed=77, batch_size=4,
                        canvas_size=(96, 96), sparse_transfer=True)
        cfg = dataclasses.replace(cfg, transfer_codec=codec)
        gen = RPMGeneratorTPU(cfg)
        gen.generate_ids(list(range(4)))
        gen.close()
        outs[codec] = out
    ref, got = outs["rle3"], outs["rle3d"]
    walked = 0
    for root, _dirs, files in os.walk(ref):
        for f in sorted(files):
            rp = os.path.join(root, f)
            gp = rp.replace(ref, got, 1)
            assert os.path.exists(gp), f"missing {gp}"
            if f.endswith(".png"):
                import cv2
                a, bb = cv2.imread(rp), cv2.imread(gp)
                # encodings may differ (palette vs truecolor PNG); the
                # decoded pixels must not
                np.testing.assert_array_equal(a, bb, err_msg=f)
                walked += 1
    assert walked >= 4 * (4 + 4 + 1)  # states + options/proto + grids


# ---- rle4 / rle4d (u8-length wire format + u16 extension stream) ----

def test_rle4_matches_rle3_stream():
    """frame(i) from the v4 wire format must equal the rle3 view
    bit-for-bit, including long runs spliced from the LNX stream."""
    from reasoning_image_generation_tpu.ops.rle import (
        pack_batch_rle2, compact_rle3, compact_rle4, Rle3Frames)
    # big uniform regions -> plenty of runs >255 px
    imgs = np.stack([_img(30 + i, n_rects=5, H=128, W=128)
                     for i in range(4)])
    cap = 4096
    ln2, co2, cnt2 = pack_batch_rle2(jnp.asarray(imgs), cap)
    from reasoning_image_generation_tpu.ops.rle import PAL_K

    def trim(packed):
        """Truncate each stream to its true content, as the converged
        adaptive tier would before shipping (io/transfer.py)."""
        p = [np.asarray(a) for a in packed]
        cnt = p[5 if len(p) == 9 else 4]
        t = int(np.minimum(cnt, cap).sum())
        nck = int(np.minimum(p[6 if len(p) == 9 else 5], PAL_K).sum())
        e = int(p[7 if len(p) == 9 else 6].sum())
        p[0], p[1], p[2], p[3] = p[0][:t], p[1][:t], p[2][:nck], p[3][:e]
        if len(p) == 9:
            p[4] = p[4][:int(p[8].sum())]
        return p

    fr3 = Rle3Frames(trim(compact_rle3(ln2, co2, cnt2)), cap)
    fr4 = Rle3Frames(trim(compact_rle4(ln2, co2, cnt2)), cap)
    assert fr4.LNX is not None and int(fr4.xc.sum()) > 0
    assert fr4.LN.dtype == np.uint8
    for i in range(4):
        l3, c3 = fr3.frame(i)
        l4, c4 = fr4.frame(i)
        np.testing.assert_array_equal(l4, l3)
        np.testing.assert_array_equal(c4, c3)
        np.testing.assert_array_equal(fr4.unpack(i, (128, 128)), imgs[i])
    # the byte win is the codec's reason to exist: 1 B/run saved on the
    # length stream minus 2 B per >255-px run on the extension stream
    assert fr4.nbytes_shipped() < fr3.nbytes_shipped()


def test_rle4_forced_u16_split_roundtrip():
    """A uniform frame larger than U16_RUN exercises both the 65535-px
    forced split and the >255 extension path."""
    from reasoning_image_generation_tpu.ops.rle import (
        pack_batch_rle4, Rle3Frames, U16_RUN)
    img = np.full((300, 512, 3), 9, np.uint8)
    packed = pack_batch_rle4(jnp.asarray(img[None]), 1024)
    fr = Rle3Frames([np.asarray(a) for a in packed], 1024)
    n = 300 * 512
    assert int(fr.cnt[0]) == -(-n // U16_RUN)
    assert int(fr.xc[0]) == int(fr.cnt[0])  # every run is >255 px
    np.testing.assert_array_equal(fr.unpack(0, (300, 512)), img)


def test_rle4_truncated_lnx_overflow_detected():
    """A shrunken LNX stream flags only frames whose extension slice was
    cut — earlier frames still decode exactly."""
    from reasoning_image_generation_tpu.ops.rle import (
        pack_batch_rle4, Rle3Frames)
    imgs = np.stack([_img(50 + i, n_rects=4, H=128, W=128)
                     for i in range(4)])
    cap = 4096
    packed = [np.asarray(a) for a in pack_batch_rle4(jnp.asarray(imgs), cap)]
    xc = packed[8]
    assert all(int(x) > 0 for x in xc)
    total_x = int(xc.sum())
    packed[4] = packed[4][:total_x - int(xc[-1]) // 2 - 1]
    fr = Rle3Frames(packed, cap)
    assert fr.overflow_indices(4).tolist() == [3]
    for i in range(3):
        np.testing.assert_array_equal(fr.unpack(i, (128, 128)), imgs[i])
    try:
        fr.unpack(3, (128, 128))
        raise AssertionError("expected OverflowError")
    except OverflowError:
        pass


def test_rle4d_roundtrip_exact_chain():
    from reasoning_image_generation_tpu.ops.rle import (
        pack_batch_rle2_delta, compact_rle4d, Rle3Frames)
    seq = _seq(13, L=5, H=128, W=128)
    cap = 4096
    bases = np.concatenate([255 - seq[:1], seq[:-1]])
    ln, co, cp, cnt = pack_batch_rle2_delta(
        jnp.asarray(seq), jnp.asarray(bases), cap)
    packed = compact_rle4d(ln, co, cp, cnt)
    fr = Rle3Frames([np.asarray(a) for a in packed], cap, delta=True)
    assert fr.overflow_indices(5).size == 0
    prev = np.zeros_like(seq[0])
    for t in range(5):
        got = fr.unpack_delta(t, prev, (128, 128))
        np.testing.assert_array_equal(got, seq[t])
        prev = got


def test_generator_end_to_end_rle4d_matches_rle3(tmp_path):
    """Full export under the default v4 delta codec must write
    pixel-identical PNGs and the same file set as rle3."""
    import os
    import dataclasses
    from reasoning_image_generation_tpu.utils.config import GenConfig
    from reasoning_image_generation_tpu.models.rpm.generator import (
        RPMGeneratorTPU)
    outs = {}
    for codec in ("rle3", "rle4d", "rle5d"):
        out = str(tmp_path / codec)
        cfg = GenConfig(out_dir=out, seed=78, batch_size=4,
                        canvas_size=(96, 96), sparse_transfer=True)
        cfg = dataclasses.replace(cfg, transfer_codec=codec)
        gen = RPMGeneratorTPU(cfg)
        gen.generate_ids(list(range(4)))
        gen.close()
        outs[codec] = out
    ref = outs["rle3"]
    for other in ("rle4d", "rle5d"):
        got = outs[other]
        walked = 0
        for root, _dirs, files in os.walk(ref):
            for f in sorted(files):
                rp = os.path.join(root, f)
                gp = rp.replace(ref, got, 1)
                assert os.path.exists(gp), f"missing {gp}"
                if f.endswith(".png"):
                    import cv2
                    a, bb = cv2.imread(rp), cv2.imread(gp)
                    np.testing.assert_array_equal(a, bb, err_msg=f)
                    walked += 1
        assert walked >= 4 * (4 + 4 + 1)


def test_overflow_reasons_attribution():
    """overflow_reasons names the stream whose shrunken slice was cut."""
    from reasoning_image_generation_tpu.ops.rle import (
        pack_batch_rle4, Rle3Frames)
    imgs = np.stack([_img(90 + i, n_rects=4, H=128, W=128)
                     for i in range(4)])
    packed = [np.asarray(a) for a in pack_batch_rle4(jnp.asarray(imgs), 4096)]
    fr = Rle3Frames(packed, 4096)
    assert fr.overflow_reasons(4) == {}
    cut = list(packed)
    cut[4] = cut[4][:int(packed[8][:3].sum())]   # drop frame 3's LNX slice
    fr2 = Rle3Frames(cut, 4096)
    assert fr2.overflow_reasons(4) == {"X": 1}
    cut2 = list(packed)
    tot = int(np.minimum(packed[5], 4096).sum())
    cut2[0] = cut2[0][:tot - 1]                  # clip the length stream
    fr3 = Rle3Frames(cut2, 4096)
    assert fr3.overflow_reasons(4) == {"T": 1}


# ---- rle5 / rle5d (length-1 bitmask wire format) ----

def test_rle5_matches_rle4_stream():
    """frame(i) from the v5 wire format must equal the v4 view
    bit-for-bit; the bitmask must beat the u8 length stream on byte
    count for run-length-1-dominated frames (the production shape)."""
    from reasoning_image_generation_tpu.ops.rle import (
        pack_batch_rle2, compact_rle4, compact_rle5, Rle3Frames, PAL_K)
    rng = np.random.default_rng(11)
    imgs = np.stack([_img(60 + i, n_rects=5, H=128, W=128)
                     for i in range(4)])
    # salt with single-pixel AA-like speckles so length-1 runs dominate
    for i in range(4):
        ys = rng.integers(0, 128, 700)
        xs = rng.integers(0, 128, 700)
        imgs[i, ys, xs] = rng.integers(0, 255, (700, 3))
    cap = 8192
    ln2, co2, cnt2 = pack_batch_rle2(jnp.asarray(imgs), cap)

    def trim(packed):
        p = [np.asarray(a) for a in packed]
        v5 = len(p) == 11
        base = 6 if v5 else 5
        cnt = p[base]
        t = int(np.minimum(cnt, cap).sum())
        nck = int(np.minimum(p[base + 1], PAL_K).sum())
        e = int(p[base + 2].sum())
        x = int(p[base + 3].sum())
        if v5:
            bc = int(((np.minimum(cnt, cap) + 7) // 8).sum())
            s = int(p[10].sum())
            p[0], p[1], p[2] = p[0][:bc], p[1][:s], p[2][:t]
            p[3], p[4], p[5] = p[3][:nck], p[4][:e], p[5][:x]
        else:
            p[0], p[1], p[2] = p[0][:t], p[1][:t], p[2][:nck]
            p[3], p[4] = p[3][:e], p[4][:x]
        return p

    fr4 = Rle3Frames(trim(compact_rle4(ln2, co2, cnt2)), cap)
    fr5 = Rle3Frames(trim(compact_rle5(ln2, co2, cnt2)), cap)
    assert fr5.BM is not None and int(fr5.sc.sum()) > 0
    for i in range(4):
        l4, c4 = fr4.frame(i)
        l5, c5 = fr5.frame(i)
        np.testing.assert_array_equal(l5, l4)
        np.testing.assert_array_equal(c5, c4)
        np.testing.assert_array_equal(fr5.unpack(i, (128, 128)), imgs[i])
    assert fr5.nbytes_shipped() < fr4.nbytes_shipped()


def test_rle5_forced_u16_split_roundtrip():
    """A uniform frame: every run is >255 px (no length-1 runs at all) —
    the bitmask is all zeros and every length rides LNS=0 + LNX."""
    from reasoning_image_generation_tpu.ops.rle import (
        pack_batch_rle5, Rle3Frames, U16_RUN)
    img = np.full((300, 512, 3), 9, np.uint8)
    packed = pack_batch_rle5(jnp.asarray(img[None]), 1024)
    fr = Rle3Frames([np.asarray(a) for a in packed], 1024)
    n = 300 * 512
    assert int(fr.cnt[0]) == -(-n // U16_RUN)
    assert int(fr.sc[0]) == int(fr.cnt[0])   # every run is != 1
    assert int(fr.xc[0]) == int(fr.cnt[0])   # ... and >255 px
    np.testing.assert_array_equal(fr.unpack(0, (300, 512)), img)


def test_rle5_truncated_streams_overflow_detected():
    """Shrunken BM / LNS slices flag only the frames they cut."""
    from reasoning_image_generation_tpu.ops.rle import (
        pack_batch_rle5, Rle3Frames)
    imgs = np.stack([_img(70 + i, n_rects=4, H=128, W=128)
                     for i in range(4)])
    cap = 4096
    packed = [np.asarray(a) for a in pack_batch_rle5(jnp.asarray(imgs), cap)]
    cnt, sc = packed[6], packed[10]
    bc = (np.minimum(cnt, cap) + 7) // 8
    cut = list(packed)
    cut[0] = cut[0][:int(bc[:3].sum())]      # drop frame 3's bitmask
    fr = Rle3Frames(cut, cap)
    assert fr.overflow_indices(4).tolist() == [3]
    assert fr.overflow_reasons(4).get("B") == 1
    for i in range(3):
        np.testing.assert_array_equal(fr.unpack(i, (128, 128)), imgs[i])
    cut2 = list(packed)
    cut2[1] = cut2[1][:int(sc[:3].sum())]    # drop frame 3's LNS slice
    fr2 = Rle3Frames(cut2, cap)
    assert fr2.overflow_indices(4).tolist() == [3]
    assert fr2.overflow_reasons(4).get("S") == 1


def test_rle5d_roundtrip_exact_chain():
    from reasoning_image_generation_tpu.ops.rle import (
        pack_batch_rle2_delta, compact_rle5d, Rle3Frames)
    seq = _seq(17, L=5, H=128, W=128)
    cap = 4096
    bases = np.concatenate([255 - seq[:1], seq[:-1]])
    ln, co, cp, cnt = pack_batch_rle2_delta(
        jnp.asarray(seq), jnp.asarray(bases), cap)
    packed = compact_rle5d(ln, co, cp, cnt)
    fr = Rle3Frames([np.asarray(a) for a in packed], cap, delta=True)
    assert fr.overflow_indices(5).size == 0
    prev = np.zeros_like(seq[0])
    for t in range(5):
        got = fr.unpack_delta(t, prev, (128, 128))
        np.testing.assert_array_equal(got, seq[t])
        prev = got
