"""Device-resident dataset staging (data.device_store): index loaders,
HBM gather correctness, and Trainer-path equivalence with the file
loader. See BASELINE.md "end-to-end epoch" — this is the mechanism that
lets epoch rate match step rate when H2D bandwidth is the bottleneck."""

import numpy as np
import jax
import jax.numpy as jnp

from mae_clip_tpu.data.device_store import (DeviceStore, build_device_store,
                                            make_index_loader)
from mae_clip_tpu.train.optim import make_optimizer
from mae_clip_tpu.train.state import TrainState
from mae_clip_tpu.train.loop import Trainer, make_train_step

from tests.test_train import TINY_TEXT, TINY_VIT, build, tiny_cfg  # noqa


def test_index_loader_matches_file_loader_semantics():
    """Same (seed, n) shuffle order, coverage, and tail padding as
    pipeline.make_loader."""
    n, bs = 10, 4
    batches = list(make_index_loader(n, bs, shuffle=True, seed=3))
    assert len(batches) == 3
    seen = []
    for b in batches:
        assert b["indices"].shape == (bs,) and b["indices"].dtype == np.int32
        assert b["valid"].shape == (bs,)
        seen.extend(b["indices"][b["valid"]].tolist())
    assert sorted(seen) == list(range(n))          # each example once
    assert batches[-1]["valid"].sum() == n % bs    # ragged tail masked
    expected = np.arange(n)
    np.random.default_rng(3).shuffle(expected)     # make_loader's shuffle
    np.testing.assert_array_equal(np.asarray(seen), expected)
    # drop_last drops the ragged tail entirely
    assert len(list(make_index_loader(n, bs, drop_last=True))) == 2


def test_store_gather_matches_host_indexing():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, size=(7, 4, 4, 3)).astype(np.uint8)
    feats = rng.normal(size=(7, 5)).astype(np.float32)
    store = DeviceStore({"image": jnp.asarray(imgs),
                         "text_features": jnp.asarray(feats)})
    idx = jnp.asarray(np.array([3, 0, 6, 3], np.int32))
    out = store.gather(idx)
    np.testing.assert_array_equal(np.asarray(out["image"]),
                                  imgs[[3, 0, 6, 3]])
    np.testing.assert_array_equal(np.asarray(out["text_features"]),
                                  feats[[3, 0, 6, 3]])
    assert store.nbytes == imgs.nbytes + feats.nbytes


def test_build_device_store_chunked_upload_and_token_table():
    class FakeDS:
        input_ids = np.arange(12, dtype=np.int32).reshape(6, 2)
        attention_mask = np.ones((6, 2), np.int32)

        def __len__(self):
            return 6

        def load_image(self, i):
            return np.full((4, 4, 3), i, np.uint8)

    store = build_device_store(FakeDS(), chunk_bytes=100)  # forces chunks
    assert store.n == 6
    np.testing.assert_array_equal(
        np.asarray(store.arrays["image"])[:, 0, 0, 0], np.arange(6))
    np.testing.assert_array_equal(np.asarray(store.arrays["input_ids"]),
                                  FakeDS.input_ids)


def test_trainer_device_store_equals_file_path():
    """Two Trainers — one fed file-style batches, one fed index batches
    over a device store — produce identical losses and params."""
    cfg = tiny_cfg(batch_size=4, epochs=1, metric_fetch_every=1)
    model, variables, _ = build(cfg)
    rng = np.random.default_rng(1)
    n = 10
    images = rng.normal(size=(n, 16, 16, 3)).astype(np.float32)
    ids = rng.integers(0, 64, size=(n, 12)).astype(np.int32)
    mask = np.ones((n, 12), np.int32)

    def file_batches():
        out = []
        for b in make_index_loader(n, 4):
            idx, valid = b["indices"], b["valid"]
            out.append({"image": images[idx], "input_ids": ids[idx],
                        "attention_mask": mask[idx], "valid": valid})
        return out

    params0 = jax.tree_util.tree_map(np.asarray, variables["params"])

    t_file = Trainer(cfg, model, jax.tree_util.tree_map(jnp.asarray,
                                                        params0))
    m_file = t_file.train_epoch(file_batches())

    store = DeviceStore({"image": jnp.asarray(images),
                         "input_ids": jnp.asarray(ids),
                         "attention_mask": jnp.asarray(mask)})
    t_store = Trainer(cfg, model, jax.tree_util.tree_map(jnp.asarray,
                                                         params0),
                      train_store=store, valid_store=store)
    m_store = t_store.train_epoch(make_index_loader(n, 4))

    assert np.isclose(m_file.avg, m_store.avg, rtol=1e-6), \
        (m_file.avg, m_store.avg)
    for a, b in zip(jax.tree_util.tree_leaves(t_file.state.params),
                    jax.tree_util.tree_leaves(t_store.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # valid_epoch through the store path agrees too
    v_file = t_file.valid_epoch(file_batches())
    v_store = t_store.valid_epoch(make_index_loader(n, 4))
    assert np.isclose(v_file.avg, v_store.avg, rtol=1e-6)


def test_store_retrieval_embeddings_match_loader_path():
    from mae_clip_tpu.eval.retrieval import (
        compute_image_embeddings, compute_image_embeddings_from_store)

    cfg = tiny_cfg(batch_size=4)
    model, variables, _ = build(cfg)
    rng = np.random.default_rng(2)
    n = 6
    images = rng.normal(size=(n, 16, 16, 3)).astype(np.float32)

    def loader():
        for s in range(0, n, 4):
            chunk = images[s:s + 4]
            pad = 4 - len(chunk)
            valid = np.concatenate([np.ones(len(chunk), bool),
                                    np.zeros(pad, bool)])
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:],
                                     chunk.dtype)])
            yield {"image": chunk, "valid": valid}

    emb_loader = compute_image_embeddings(model, variables, loader())
    store = DeviceStore({"image": jnp.asarray(images)})
    emb_store = compute_image_embeddings_from_store(model, variables,
                                                    store, n, 4)
    np.testing.assert_allclose(np.asarray(emb_loader),
                               np.asarray(emb_store), atol=1e-6)


def test_superstep_equals_per_step_path():
    """steps_per_call>1 (lax.scan over K steps per dispatch, padded tail
    skipped via cond) must produce identical params and losses to the
    per-step store path (train/loop.py superstep)."""
    n = 10
    rng = np.random.default_rng(7)
    images = rng.normal(size=(n, 16, 16, 3)).astype(np.float32)
    ids = rng.integers(0, 64, size=(n, 12)).astype(np.int32)
    mask = np.ones((n, 12), np.int32)
    store = DeviceStore({"image": jnp.asarray(images),
                         "input_ids": jnp.asarray(ids),
                         "attention_mask": jnp.asarray(mask)})

    cfg1 = tiny_cfg(batch_size=4, epochs=1, steps_per_call=1)
    model, variables, _ = build(cfg1)
    params0 = jax.tree_util.tree_map(np.asarray, variables["params"])

    t1 = Trainer(cfg1, model, jax.tree_util.tree_map(jnp.asarray, params0),
                 train_store=store, valid_store=store)
    m1 = t1.train_epoch(make_index_loader(n, 4))

    # k=2 over 3 batches: one full group + one padded tail group
    cfg2 = tiny_cfg(batch_size=4, epochs=1, steps_per_call=2)
    t2 = Trainer(cfg2, model, jax.tree_util.tree_map(jnp.asarray, params0),
                 train_store=store, valid_store=store)
    assert t2._superstep_k(train=True) == 2
    m2 = t2.train_epoch(make_index_loader(n, 4))

    assert np.isclose(m1.avg, m2.avg, rtol=1e-6), (m1.avg, m2.avg)
    assert m1.count == m2.count == n
    for a, b in zip(jax.tree_util.tree_leaves(t1.state.params),
                    jax.tree_util.tree_leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert int(t2.state.step) == 3        # padded row did NOT step

    v1 = t1.valid_epoch(make_index_loader(n, 4))
    v2 = t2.valid_epoch(make_index_loader(n, 4))
    assert np.isclose(v1.avg, v2.avg, rtol=1e-6)
    assert v1.count == v2.count == n


def test_superstep_forced_off_for_batch_scheduler_and_progress():
    cfg = tiny_cfg(batch_size=4, scheduler_step="batch", steps_per_call=8)
    model, variables, _ = build(cfg)
    store = DeviceStore({"image": jnp.zeros((4, 16, 16, 3))})
    t = Trainer(cfg, model, variables["params"], train_store=store)
    assert t._superstep_k(train=True) == 1
    cfg2 = tiny_cfg(batch_size=4, steps_per_call=8)
    t2 = Trainer(cfg2, model, variables["params"], train_store=store,
                 progress=True)
    assert t2._superstep_k(train=True) == 1
    t3 = Trainer(cfg2, model, variables["params"])  # no store
    assert t3._superstep_k(train=True) == 1


def test_superstep_over_mesh_matches_single_device():
    """DP mesh + device store + steps_per_call>1: the in-scan shard_batch
    (device_put-with-sharding is traceable as a constraint) must preserve
    exact per-step semantics vs the meshless superstep."""
    from mae_clip_tpu.parallel.mesh import mesh_from_config

    n, bs = 16, 8
    rng = np.random.default_rng(9)
    images = rng.normal(size=(n, 16, 16, 3)).astype(np.float32)
    ids = rng.integers(0, 64, size=(n, 12)).astype(np.int32)
    mask = np.ones((n, 12), np.int32)
    store = DeviceStore({"image": jnp.asarray(images),
                         "input_ids": jnp.asarray(ids),
                         "attention_mask": jnp.asarray(mask)})

    model, variables, _ = build(tiny_cfg(batch_size=bs))
    params0 = jax.tree_util.tree_map(np.asarray, variables["params"])
    mesh = mesh_from_config(tiny_cfg(batch_size=bs).mesh)
    assert len(mesh.devices.flatten()) == 8

    # Same mesh, K=1 vs K=2: isolates the superstep mechanics (in-scan
    # gather + shard_batch + cond tail) from mesh-reduction float noise
    # (which legitimately compounds across Adam steps and is covered by
    # test_train.test_mesh_step_matches_single_device at the step level).
    results = {}
    for k in (1, 2):
        cfg = tiny_cfg(batch_size=bs, epochs=1, steps_per_call=k)
        t = Trainer(cfg, model,
                    jax.tree_util.tree_map(jnp.asarray, params0),
                    mesh=mesh, train_store=store, valid_store=store)
        assert t._superstep_k(train=True) == k
        m = t.train_epoch(make_index_loader(n, bs))
        v = t.valid_epoch(make_index_loader(n, bs))
        results[k] = (m, v, t.state)

    m1, v1, s1 = results[1]
    m2, v2, s2 = results[2]
    assert np.isclose(m1.avg, m2.avg, rtol=1e-6), (m1.avg, m2.avg)
    assert np.isclose(v1.avg, v2.avg, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


def test_checkpoint_every_cadence(tmp_path):
    """checkpoint_every: 0 disables saves; N saves best/final/every-N
    (best-val always saved — the reference's only policy,
    main.py:118-122)."""
    from mae_clip_tpu.train.checkpoint import CheckpointManager

    n = 8
    rng = np.random.default_rng(3)
    store = DeviceStore({
        "image": jnp.asarray(rng.normal(size=(n, 16, 16, 3))
                             .astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 64, size=(n, 12))
                                 .astype(np.int32)),
        "attention_mask": jnp.asarray(np.ones((n, 12), np.int32))})

    def run(every, epochs, sub):
        cfg = tiny_cfg(batch_size=4, epochs=epochs,
                       checkpoint_every=every,
                       checkpoints=str(tmp_path / sub))
        model, variables, _ = build(cfg)
        mngr = CheckpointManager(cfg.checkpoints)
        t = Trainer(cfg, model, variables["params"],
                    checkpoint_manager=mngr,
                    train_store=store, valid_store=store)
        t.fit(lambda: make_index_loader(n, 4),
              lambda: make_index_loader(n, 4))
        mngr.wait()
        return sorted(int(d.name) for d in (tmp_path / sub).iterdir()
                      if d.name.isdigit())

    assert run(0, 3, "none") == []                    # disabled
    saved = run(5, 3, "final")                        # no every-N hit
    assert 2 in saved                                 # final epoch saved


def test_sharded_index_loader_blocked_coverage():
    """Blocked layout: batch block d draws only from shard d's row range;
    every real row exactly once per epoch; in-shard pads valid=False."""
    from mae_clip_tpu.data.device_store import make_sharded_index_loader

    n, bs, d = 14, 8, 4                     # rps=4, b_local=2
    batches = list(make_sharded_index_loader(n, bs, d, shuffle=True,
                                             seed=1))
    assert len(batches) == 2
    rps, b_local = 4, 2
    seen = []
    for b in batches:
        assert b["indices"].dtype == np.int32
        for s in range(d):
            blk = b["indices"][s * b_local:(s + 1) * b_local]
            assert ((blk >= s * rps) & (blk < (s + 1) * rps)).all()
        seen.extend(b["indices"][b["valid"]].tolist())
    assert sorted(seen) == list(range(n))
    # different epochs reshuffle within shards
    e2 = list(make_sharded_index_loader(n, bs, d, shuffle=True, seed=1,
                                        epoch=1))
    assert any((a["indices"] != b["indices"]).any()
               for a, b in zip(batches, e2))


def test_sharded_store_gather_and_training_matches_replicated():
    """ShardedDeviceStore over the 8-device mesh: eager gather accepts
    arbitrary indices (eval sweeps), the shard_map traced gather matches
    numpy on blocked batches, and a superstep Trainer epoch produces the
    SAME final params as the replicated store fed identical batches."""
    from mae_clip_tpu.data.device_store import (ShardedDeviceStore,
                                                build_sharded_device_store,
                                                make_sharded_index_loader)
    from mae_clip_tpu.parallel.mesh import mesh_from_config

    n, bs = 14, 8
    rng = np.random.default_rng(11)
    images = rng.normal(size=(n, 16, 16, 3)).astype(np.float32)
    ids = rng.integers(0, 64, size=(n, 12)).astype(np.int32)
    mask = np.ones((n, 12), np.int32)

    cfg = tiny_cfg(batch_size=bs, epochs=1, steps_per_call=2)
    mesh = mesh_from_config(cfg.mesh)
    d = mesh.shape["data"]
    assert bs % d == 0

    class FakeDS:
        input_ids = ids
        attention_mask = mask

        def __len__(self):
            return n

        def load_image(self, i):
            raise AssertionError("images= should bypass decode")

    store = build_sharded_device_store(FakeDS(), mesh=mesh, images=images)
    rps = store.rows_per_shard
    assert store.n == rps * d and store.n_real == n
    pad = store.n - n
    padded = np.concatenate(
        [images, np.zeros((pad,) + images.shape[1:], images.dtype)])

    # eager gather: ARBITRARY (non-blocked) indices, the eval-sweep path
    idx = np.array([13, 0, 7, 5], np.int32)
    out = store.gather(jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(out["image"]), images[idx])

    # traced (shard_map local) gather on a BLOCKED batch == numpy
    b0 = next(iter(make_sharded_index_loader(n, bs, d, shuffle=True,
                                             seed=2)))
    g = jax.jit(store.traced_gather)(store.arrays,
                                     jnp.asarray(b0["indices"]))
    np.testing.assert_allclose(np.asarray(g["image"]),
                               padded[b0["indices"]])
    pid = np.concatenate([ids, np.zeros((pad, 12), ids.dtype)])
    np.testing.assert_array_equal(np.asarray(g["input_ids"]),
                                  pid[b0["indices"]])

    # identical blocked batches through sharded vs replicated stores
    # must train identically (both arms on the same mesh).
    model, variables, _ = build(cfg)
    params0 = jax.tree_util.tree_map(np.asarray, variables["params"])
    rep = DeviceStore({"image": jnp.asarray(padded),
                       "input_ids": jnp.asarray(pid),
                       "attention_mask": jnp.asarray(
                           np.concatenate([mask,
                                           np.ones((pad, 12), np.int32)]))})
    loader = lambda: make_sharded_index_loader(n, bs, d, shuffle=True,
                                               seed=5)
    states = {}
    for name, st in (("sharded", store), ("replicated", rep)):
        t = Trainer(cfg, model,
                    jax.tree_util.tree_map(jnp.asarray, params0),
                    mesh=mesh, train_store=st, valid_store=st)
        assert t._superstep_k(train=True) == 2
        t.train_epoch(loader())
        t.valid_epoch(loader())
        states[name] = t.state
    for a, b in zip(jax.tree_util.tree_leaves(states["sharded"].params),
                    jax.tree_util.tree_leaves(states["replicated"].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sharded_index_loader_fewer_rows_than_shards():
    """n < n_shards: empty shards emit only in-range pad indices with
    valid=False; every real row still appears exactly once."""
    from mae_clip_tpu.data.device_store import make_sharded_index_loader

    batches = list(make_sharded_index_loader(3, 8, 8))
    assert len(batches) == 1
    b = batches[0]
    assert sorted(b["indices"][b["valid"]].tolist()) == [0, 1, 2]
    assert b["valid"].sum() == 3
    assert (b["indices"] >= 0).all() and (b["indices"] < 8).all()


def test_deduped_store_gather_and_memory():
    """Deduped staging (caption datasets repeat each image per caption,
    reference coco_captions_to_df.py:17-25): unique images staged once +
    an (N,) row->image map; gathers are bit-identical to the duplicated
    store at a fraction of the staged bytes."""

    class CaptionsDS:
        # 3 unique images across 7 rows (COCO-style repetition).
        image_filenames = ["a.jpg", "b.jpg", "a.jpg", "c.jpg", "b.jpg",
                           "a.jpg", "c.jpg"]
        input_ids = np.arange(14, dtype=np.int32).reshape(7, 2)
        attention_mask = np.ones((7, 2), np.int32)

        def __len__(self):
            return 7

        def load_image(self, i):
            # Image content determined by the FILE, not the row.
            val = {"a.jpg": 10, "b.jpg": 20, "c.jpg": 30}[
                self.image_filenames[i]]
            return np.full((4, 4, 3), val, np.uint8)

    ds = CaptionsDS()
    dedup = build_device_store(ds)
    dup = build_device_store(ds, dedup_images=False)

    assert dup.arrays["image"].shape[0] == 7
    assert dedup.arrays["image"].shape[0] == 3          # unique files
    assert DeviceStore.MAP_PREFIX + "image" in dedup.arrays
    assert dedup.n == dup.n == 7
    assert dedup.nbytes < dup.nbytes

    idx = jnp.asarray(np.array([6, 0, 2, 5], np.int32))
    a, b = dedup.gather(idx), dup.gather(idx)
    assert set(a) == set(b) == {"image", "input_ids", "attention_mask"}
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


def test_sharded_store_dedup_matches_duplicated():
    """Per-shard dedup on the row-sharded store (_dedup_decode_sharded):
    gathers (eager arbitrary-index AND traced blocked) bit-match the
    duplicated sharded store at fewer staged bytes; an image straddling a
    shard boundary is stored once per shard (correct, just less saving);
    a superstep Trainer epoch bit-matches too."""
    from mae_clip_tpu.data.device_store import (build_sharded_device_store,
                                                make_sharded_index_loader)
    from mae_clip_tpu.parallel.mesh import mesh_from_config

    # rows 0-13 over 4 shards (rps=4): shard0 [a,a,b,c] — 'c' STRADDLES
    # into shard1 [c,c,d,d]; shard2 [e,e,f,f]; shard3 [g,g] (ragged).
    names = ["a", "a", "b", "c", "c", "c", "d", "d",
             "e", "e", "f", "f", "g", "g"]
    n = len(names)
    ids = np.arange(2 * n, dtype=np.int32).reshape(n, 2)

    class CaptionsDS:
        image_filenames = names
        input_ids = ids
        attention_mask = np.ones((n, 2), np.int32)

        def __len__(self):
            return n

        def load_image(self, i):
            return np.full((4, 4, 3), ord(names[i]), np.uint8)

    cfg = tiny_cfg(batch_size=8, epochs=1, steps_per_call=2)
    mesh = mesh_from_config(cfg.mesh)
    mesh4 = jax.sharding.Mesh(mesh.devices.reshape(4, 2)[:, 0], ("data",))

    ds = CaptionsDS()
    ded = build_sharded_device_store(ds, mesh=mesh4)
    dup = build_sharded_device_store(ds, mesh=mesh4, dedup_images=False)

    assert ded.n == dup.n == 16 and ded.n_real == dup.n_real == n
    # u_max = 3 ('a','b','c' in shard0) -> 12 storage rows, not 16.
    assert ded.arrays["image"].shape[0] == 12
    assert DeviceStore.MAP_PREFIX + "image" in ded.arrays
    assert ded.nbytes < dup.nbytes

    # eager gather, ARBITRARY (non-blocked) indices incl. the straddler
    idx = jnp.asarray(np.array([13, 3, 4, 0, 7], np.int32))
    a, b = ded.gather(idx), dup.gather(idx)
    for k in ("image", "input_ids", "attention_mask"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)

    # traced (shard_map local, zero-collective) gather on blocked batches
    for bt in make_sharded_index_loader(n, 8, 4, shuffle=True, seed=3):
        g1 = jax.jit(ded.traced_gather)(ded.arrays,
                                        jnp.asarray(bt["indices"]))
        g2 = jax.jit(dup.traced_gather)(dup.arrays,
                                        jnp.asarray(bt["indices"]))
        for k in g1:
            np.testing.assert_array_equal(np.asarray(g1[k]),
                                          np.asarray(g2[k]), err_msg=k)

    # identical blocked batches train identically through the superstep
    # (Trainer takes the mesh object; cfg.mesh only supplies axis names)
    cfg4 = cfg
    model, variables, _ = build(cfg4)
    params0 = jax.tree_util.tree_map(np.asarray, variables["params"])
    loader = lambda: make_sharded_index_loader(n, 8, 4, shuffle=True,
                                               seed=7)
    states = []
    for st in (ded, dup):
        t = Trainer(cfg4, model,
                    jax.tree_util.tree_map(jnp.asarray, params0),
                    mesh=mesh4, train_store=st, valid_store=st)
        assert t._superstep_k(train=True) == 2
        t.train_epoch(loader())
        states.append(t.state)
    for x, y in zip(jax.tree_util.tree_leaves(states[0].params),
                    jax.tree_util.tree_leaves(states[1].params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_sharded_dedup_declined_when_all_unique():
    """All-unique filenames: _dedup_decode_sharded returns None and the
    builder stages the plain duplicated layout (no map key)."""
    from mae_clip_tpu.data.device_store import build_sharded_device_store
    from mae_clip_tpu.parallel.mesh import mesh_from_config

    n = 8
    cfg = tiny_cfg(batch_size=8)
    mesh = mesh_from_config(cfg.mesh)

    class DS:
        image_filenames = [f"{i}.jpg" for i in range(n)]

        def __len__(self):
            return n

        def load_image(self, i):
            return np.full((4, 4, 3), i, np.uint8)

    st = build_sharded_device_store(DS(), mesh=mesh)
    assert DeviceStore.MAP_PREFIX + "image" not in st.arrays
    assert st.arrays["image"].shape[0] == n


def test_deduped_store_trains_identically_through_superstep():
    """A Trainer epoch over the deduped store (map riding through the
    in-scan traced_gather) bit-matches the duplicated store."""
    n_imgs, reps = 4, 3
    n = n_imgs * reps                                    # 12 rows
    rng = np.random.default_rng(11)
    uniq = rng.normal(size=(n_imgs, 16, 16, 3)).astype(np.float32)
    row_map = np.tile(np.arange(n_imgs, dtype=np.int32), reps)
    ids = rng.integers(0, 64, size=(n, 12)).astype(np.int32)
    mask = np.ones((n, 12), np.int32)

    dup_store = DeviceStore({"image": jnp.asarray(uniq[row_map]),
                             "input_ids": jnp.asarray(ids),
                             "attention_mask": jnp.asarray(mask)})
    ded_store = DeviceStore({"image": jnp.asarray(uniq),
                             "input_ids": jnp.asarray(ids),
                             "attention_mask": jnp.asarray(mask)},
                            maps={"image": row_map})
    assert ded_store.n == dup_store.n == n

    cfg = tiny_cfg(batch_size=4, epochs=1, steps_per_call=2)
    model, variables, _ = build(cfg)
    params0 = jax.tree_util.tree_map(np.asarray, variables["params"])

    results = []
    for store in (dup_store, ded_store):
        t = Trainer(cfg, model,
                    jax.tree_util.tree_map(jnp.asarray, params0),
                    train_store=store, valid_store=store)
        assert t._superstep_k(train=True) == 2
        m = t.train_epoch(make_index_loader(n, 4, shuffle=True, seed=5))
        results.append((m, t.state))

    (m1, s1), (m2, s2) = results
    assert m1.count == m2.count == n
    assert np.isclose(m1.avg, m2.avg, rtol=0, atol=0), (m1.avg, m2.avg)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_overlapped_staging_matches_blocking_and_attributes_time():
    """build_device_store's overlap pipeline (producer-thread decode
    feeding donated streamed slab uploads) stages bit-identical arrays
    to the blocking path, keeps dedup engaged, and fills the setup
    attribution dict (VERDICT r3 item 6: the one-time setup was one
    opaque number)."""
    class FakeDS:
        # 9 rows over 4 unique files -> dedup keeps 4 storage rows
        image_filenames = [f"im{i % 4}.jpg" for i in range(9)]
        input_ids = np.arange(18, dtype=np.int32).reshape(9, 2)
        attention_mask = np.ones((9, 2), np.int32)

        def __len__(self):
            return 9

        def sample_shape(self):
            return (4, 4, 3), np.dtype(np.uint8)

        def load_image(self, i):
            return np.full((4, 4, 3), i % 4, np.uint8)

    timings = {}
    # chunk_bytes=100 -> 2-row slabs -> multiple stream iterations
    s_over = build_device_store(FakeDS(), chunk_bytes=100, timings=timings)
    s_block = build_device_store(FakeDS(), chunk_bytes=100, overlap=False)
    assert timings["overlap"] is True
    for k in ("decode_s", "upload_s", "wall_s"):
        assert k in timings and timings[k] >= 0.0
    assert s_over.arrays["image"].shape[0] == 4          # dedup held
    idx = jnp.asarray(np.arange(9, dtype=np.int32))
    a, b = s_over.gather(idx), s_block.gather(idx)
    np.testing.assert_array_equal(np.asarray(a["image"]),
                                  np.asarray(b["image"]))
    np.testing.assert_array_equal(np.asarray(a["input_ids"]),
                                  np.asarray(b["input_ids"]))
    # blocking arm records its own (non-overlap) attribution
    t2 = {}
    build_device_store(FakeDS(), overlap=False, timings=t2)
    assert t2["overlap"] is False and "decode_s" in t2 and "upload_s" in t2


def test_overlapped_staging_propagates_decode_errors():
    """A decode failure in the producer thread surfaces in the caller,
    not as a hang or a zero-filled store."""
    import pytest

    class BadDS:
        image_filenames = ["a.jpg", "b.jpg", "c.jpg"]

        def __len__(self):
            return 3

        def sample_shape(self):
            return (4, 4, 3), np.dtype(np.uint8)

        def load_image(self, i):
            raise ValueError("decode boom")

    with pytest.raises(ValueError, match="decode boom"):
        build_device_store(BadDS(), dedup_images=False)


def test_multiprocess_builder_matches_single_controller():
    """The process_count>1 store builder
    (_build_sharded_store_multiprocess) is process-count-agnostic: run
    it in-process (every device addressable) and its arrays must
    BIT-MATCH build_sharded_device_store's single-controller layout —
    per-shard dedup storage + global-index map tables, ragged row pad,
    token tables, and text-features — in both dedup and non-dedup
    branches. The 2-process fleet test proves the cross-process wiring;
    this pins the layout equivalence cheaply in the default suite."""
    from mae_clip_tpu.data.device_store import (
        DeviceStore, _build_sharded_store_multiprocess,
        build_sharded_device_store)
    from mae_clip_tpu.parallel.mesh import mesh_from_config

    # Same fixture as test_sharded_store_dedup_matches_duplicated: 'c'
    # straddles a shard boundary, shard3 is ragged (14 rows, 4 shards).
    names = ["a", "a", "b", "c", "c", "c", "d", "d",
             "e", "e", "f", "f", "g", "g"]
    n = len(names)

    class CaptionsDS:
        image_filenames = names
        input_ids = np.arange(2 * n, dtype=np.int32).reshape(n, 2)
        attention_mask = np.ones((n, 2), np.int32)

        def __len__(self):
            return n

        def load_image(self, i):
            return np.full((4, 4, 3), ord(names[i]), np.uint8)

        def sample_shape(self):
            return (4, 4, 3), np.dtype(np.uint8)

    cfg = tiny_cfg(batch_size=8)
    mesh = mesh_from_config(cfg.mesh)
    mesh4 = jax.sharding.Mesh(mesh.devices.reshape(4, 2)[:, 0], ("data",))
    ds = CaptionsDS()
    tf = np.arange(2 * n, dtype=np.float32).reshape(n, 2)

    for dedup in (True, False):
        ref = build_sharded_device_store(ds, mesh=mesh4, text_features=tf,
                                         dedup_images=dedup)
        mc = _build_sharded_store_multiprocess(ds, mesh4, "data",
                                               text_features=tf,
                                               dedup_images=dedup)
        assert mc.n == ref.n and mc.n_real == ref.n_real == n
        assert set(mc.arrays) == set(ref.arrays), dedup
        for k in ref.arrays:
            np.testing.assert_array_equal(
                np.asarray(mc.arrays[k]), np.asarray(ref.arrays[k]),
                err_msg=f"dedup={dedup} key={k}")
    # the dedup branch really fired (12 storage rows, not 16)
    assert (DeviceStore.MAP_PREFIX + "image"
            in _build_sharded_store_multiprocess(ds, mesh4, "data").arrays)


def test_unrolled_gather_path_matches_take(monkeypatch):
    """The big-store unrolled dynamic-slice row gather (this backend's
    TPU compiler plans a FULL-OPERAND temp copy for every XLA gather op
    — measured round 5, where it stacked to 3x the store and OOM'd the
    100k-row superstep at compile) must be bit-identical to the take
    path, including the two-level deduped gather, eager and in-jit."""
    rng = np.random.default_rng(5)
    uniq = rng.integers(0, 255, size=(5, 4, 4, 3)).astype(np.uint8)
    m = np.array([0, 0, 1, 2, 2, 3, 4, 4], np.int32)      # 8 rows -> 5 uniq
    feats = rng.normal(size=(8, 6)).astype(np.float32)
    idx = np.array([7, 0, 3, 5], np.int32)

    take_store = DeviceStore({"image": jnp.asarray(uniq),
                              "text_features": jnp.asarray(feats)},
                             maps={"image": m})
    ref = take_store.gather(jnp.asarray(idx))

    monkeypatch.setattr(DeviceStore, "UNROLLED_GATHER_MIN_BYTES", 0)
    unrolled_store = DeviceStore({"image": jnp.asarray(uniq),
                                  "text_features": jnp.asarray(feats)},
                                 maps={"image": m})
    out = unrolled_store.gather(jnp.asarray(idx))
    for k in ref:
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(ref[k]), err_msg=k)
    # and traceable inside a caller's jit (the superstep contract)
    out2 = jax.jit(lambda arrs, i: unrolled_store.traced_gather(arrs, i))(
        unrolled_store.arrays, jnp.asarray(idx))
    for k in ref:
        np.testing.assert_array_equal(np.asarray(out2[k]),
                                      np.asarray(ref[k]), err_msg=k)
