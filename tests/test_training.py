"""Training-loop tests: learning, clipnorm, DP sharding equivalence, checkpoints."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ravvent_tpu.config import DataConfig, ModelConfig, RunConfig, TrainConfig
from ravvent_tpu.data import chiron, simulator
from ravvent_tpu.data.generator import SnippetBatchGenerator
from ravvent_tpu.parallel.mesh import make_mesh
from ravvent_tpu.training.checkpoints import CheckpointManager
from ravvent_tpu.training.loop import Trainer, per_leaf_clip_by_norm


def small_cfg(**model_kw):
    return RunConfig(
        data=DataConfig(batch_size=8),
        model=ModelConfig(
            enc_units=16, dec_units=16, encoder_depth=1, decoder_depth=1,
            data_type="joint", **model_kw,
        ),
        train=TrainConfig(batch_size=8, learning_rate=3e-3, teacher_forcing=1.0),
    )


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    genome = simulator.random_genome(5000, rng)
    simulator.generate_chiron_dataset(d, genome, n_reads=3, read_len_range=(900, 1200), seed=1)
    fi = chiron.create_files_info(d, stride=6, verbose=False)
    return d, fi


def test_per_leaf_clipnorm():
    t = per_leaf_clip_by_norm(1.0)
    g = {"a": jnp.array([3.0, 4.0]), "b": jnp.array([0.1, 0.1])}
    clipped, _ = t.update(g, t.init(g))
    np.testing.assert_allclose(np.array(clipped["a"]), [0.6, 0.8], rtol=1e-6)
    np.testing.assert_allclose(np.array(clipped["b"]), [0.1, 0.1], rtol=1e-6)


def test_trainer_learns_and_validates(dataset, tmp_path):
    d, fi = dataset
    cfg = small_cfg()
    mesh = make_mesh(1)
    tr = Trainer(cfg, mesh=mesh)
    gen = SnippetBatchGenerator(fi, stride=6, batch_size=8, cache_dir=str(d / "cache"))
    val = SnippetBatchGenerator(fi, stride=6, batch_size=8, cache_dir=str(d / "cache"))

    hist = tr.fit(
        gen, val, epochs=2, steps_per_epoch=25, validation_steps=4,
        csv_log_path=str(tmp_path / "log.csv"), verbose=False,
    )
    assert hist["loss"][-1] < hist["loss"][0]
    assert np.isfinite(hist["val_loss"][-1])
    # CSV written with both epochs
    lines = open(tmp_path / "log.csv").read().strip().splitlines()
    assert len(lines) == 3  # header + 2 epochs


def test_dp_sharded_step_matches_single_device(dataset):
    """The 8-way data-parallel train step must produce the same params as
    single-device (same batch, same rng)."""
    d, fi = dataset
    cfg = small_cfg()
    gen = SnippetBatchGenerator(fi, stride=6, batch_size=8, shuffle=False,
                                cache_dir=str(d / "cache"))
    batch = gen[0]

    tr1 = Trainer(cfg, mesh=make_mesh(1))
    tr8 = Trainer(cfg, mesh=make_mesh(8))
    # identical init (same seed)
    chex_assert = np.testing.assert_allclose
    m1 = tr1.train_on_batch(batch)
    m8 = tr8.train_on_batch(batch)
    chex_assert(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(tr1.params)
    l8 = jax.tree_util.tree_leaves(tr8.params)
    for a, b in zip(l1, l8):
        chex_assert(np.array(a), np.array(b), rtol=2e-4, atol=1e-6)


def test_seq_parallel_attention_matches_single_device(dataset):
    """(4 data x 2 model) mesh — attention memory sequence-sharded over
    'model' — must match the single-device step (GSPMD inserts the softmax
    and context psums over the sharded S axis)."""
    d, fi = dataset
    cfg = small_cfg()
    gen = SnippetBatchGenerator(fi, stride=6, batch_size=8, shuffle=False,
                                cache_dir=str(d / "cache"))
    batch = gen[0]

    tr1 = Trainer(cfg, mesh=make_mesh(1))
    tr42 = Trainer(cfg, mesh=make_mesh(8, model_shards=2))
    assert tr42.mesh.shape == {"data": 4, "model": 2}
    m1 = tr1.train_on_batch(batch)
    m42 = tr42.train_on_batch(batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m42["loss"]), rtol=1e-5)
    v1 = tr1.validate_on_batch(batch)
    v42 = tr42.validate_on_batch(batch)
    np.testing.assert_allclose(float(v1["loss"]), float(v42["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(tr1.params),
                    jax.tree_util.tree_leaves(tr42.params)):
        np.testing.assert_allclose(np.array(a), np.array(b), rtol=2e-4, atol=1e-6)


def test_checkpoint_roundtrip(dataset, tmp_path):
    d, fi = dataset
    cfg = small_cfg()
    tr = Trainer(cfg, mesh=make_mesh(1))
    gen = SnippetBatchGenerator(fi, stride=6, batch_size=8, cache_dir=str(d / "cache"))
    tr.fit(gen, epochs=1, steps_per_epoch=3, verbose=False)

    cm = CheckpointManager(str(tmp_path))
    path = cfg.checkpoint_path(1)
    cm.save(path, tr.params, tr.opt_state, epoch=1, rng=tr.rng, data_seed=0)

    restored = cm.restore(path, template={
        "params": tr.params, "opt_state": tr.opt_state,
        "epoch": np.asarray(0, dtype=np.int64), "rng": tr.rng,
        "data_seed": np.asarray(0, dtype=np.int64),
    })
    assert int(restored["epoch"]) == 1
    for a, b in zip(jax.tree_util.tree_leaves(tr.params),
                    jax.tree_util.tree_leaves(restored["params"])):
        np.testing.assert_array_equal(np.array(a), np.array(b))

    # restored params give identical forward metrics
    tr2 = Trainer(cfg, mesh=make_mesh(1))
    tr2.params = restored["params"]
    m_a = tr.validate_on_batch(gen[0])
    m_b = tr2.validate_on_batch(gen[0])
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-6)


def test_cross_modality_warm_start(dataset, tmp_path):
    """A raw-model params checkpoint warm-starts a joint trainer: the params
    tree carries both encoders regardless of data_type (models/basecaller.py
    init_basecaller), so trees are interchangeable — the basis of
    tools/train.py --init-from (seed joint from a trained raw model)."""
    d, fi = dataset
    cfg_raw = small_cfg()
    cfg_raw = dataclasses.replace(
        cfg_raw, model=dataclasses.replace(cfg_raw.model, data_type="raw"))
    tr_raw = Trainer(cfg_raw, mesh=make_mesh(1))
    gen = SnippetBatchGenerator(fi, stride=6, batch_size=8, cache_dir=str(d / "cache"))
    tr_raw.fit(gen, epochs=1, steps_per_epoch=3, verbose=False)

    cm = CheckpointManager(str(tmp_path))
    cm.save("warm_src", tr_raw.params, epoch=1)

    cfg_joint = small_cfg()  # data_type="joint"
    tr_joint = Trainer(cfg_joint, mesh=make_mesh(1))
    restored = cm.restore("warm_src", template={"params": tr_joint.params})
    tr_joint.params = restored["params"]
    # raw-encoder leaves carried over exactly
    for a, b in zip(jax.tree_util.tree_leaves(tr_raw.params["encoder_raw"]),
                    jax.tree_util.tree_leaves(tr_joint.params["encoder_raw"])):
        np.testing.assert_array_equal(np.array(a), np.array(b))
    # and the joint model both validates and trains from the warm start
    m = tr_joint.validate_on_batch(gen[0])
    assert np.isfinite(float(m["loss"]))
    m2 = tr_joint.train_on_batch(gen[0])
    assert np.isfinite(float(m2["loss"]))
