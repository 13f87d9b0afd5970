"""Training CLI — closes the loop the reference leaves to a sibling repo
(upstream README.md:17): train any of the three pipeline roles (or a custom
spec) on labeled page crops or the synthetic tasks, under an SPMD
(data, model) mesh when more than one device is present, and save a
framework .npz checkpoint the detector loads directly.

    sbb_textline_train --role textline --steps 500 --out ./models
    sbb_textline_train --role region --images imgs/ --labels labs/ ...
"""

from __future__ import annotations

import os
import sys
import time

import click
import numpy as np

# Persistent compilation cache: jaxenv's default is repo-local
# (.cache/jax — /tmp is wiped between container sessions).
from sbb_textline_detection_tpu.core import jaxenv

jaxenv.enable_compilation_cache()


@click.command()
@click.option("--role",
              type=click.Choice(["page", "region", "textline", "dualhead"]),
              required=True)
@click.option("--out", "-o", required=True, type=click.Path(file_okay=False),
              help="output checkpoint directory")
@click.option("--images", type=click.Path(exists=True, file_okay=False),
              default=None, help="training images directory")
@click.option("--labels", type=click.Path(exists=True, file_okay=False),
              default=None, help="label-map PNG directory (paired by stem)")
@click.option("--steps", type=int, default=500)
@click.option("--batch", type=int, default=8)
@click.option("--lr", type=float, default=3e-4)
@click.option("--seed", type=int, default=0)
@click.option("--model-parallel", type=int, default=1,
              help="model-axis size of the (data, model) mesh")
@click.option("--log-every", type=int, default=25)
@click.option("--save-every", type=int, default=0,
              help="also checkpoint every N steps (resumable: optimizer "
                   "state and step count ride in a .trainstate.npz "
                   "sidecar)")
@click.option("--resume", is_flag=True, default=False,
              help="resume from the checkpoint in --out if present")
def main(role, out, images, labels, steps, batch, lr, seed,
         model_parallel, log_every, save_every, resume):
    """Train a pipeline segmentation model and save its checkpoint."""
    from sbb_textline_detection_tpu.core import jaxenv
    jaxenv.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from sbb_textline_detection_tpu.core.config import DEFAULT_CONFIG
    from sbb_textline_detection_tpu.models import checkpoint, registry
    from sbb_textline_detection_tpu.parallel import mesh as mesh_mod
    from sbb_textline_detection_tpu.training import data as data_mod
    from sbb_textline_detection_tpu.training import train

    spec = (registry.DUALHEAD_SPEC if role == "dualhead"
            else registry.DEFAULT_SPECS[role])
    if (images is None) != (labels is None):
        click.echo("--images and --labels must be given together", err=True)
        sys.exit(2)
    if images and role == "dualhead":
        click.echo("dualhead training uses the joint synthetic task; "
                   "labeled-crop pairs carry a single label plane", err=True)
        sys.exit(2)
    devices = jax.devices()
    if len(devices) > 1:
        data_axis = max(1, len(devices) // max(1, model_parallel))
        if batch % data_axis:
            click.echo(f"--batch {batch} must be divisible by the mesh "
                       f"data-axis size {data_axis} "
                       f"({len(devices)} devices / --model-parallel "
                       f"{model_parallel})", err=True)
            sys.exit(2)
    tx = train.make_optimizer(lr)
    name = getattr(DEFAULT_CONFIG.model_names, role)
    ckpt_path = checkpoint.checkpoint_path(out, name)
    state_path = ckpt_path + ".trainstate.npz"
    start_step = 0
    opt_state = None
    if resume and os.path.exists(ckpt_path):
        loaded_spec, variables = checkpoint.load(ckpt_path)
        if loaded_spec != spec:
            click.echo(f"checkpoint spec {loaded_spec} != {spec}", err=True)
            sys.exit(2)
        if os.path.exists(state_path):
            # a real resume: AdamW moments + step count; without them a
            # "resume" is a warm restart (zeroed moments, replayed data)
            blob = np.load(state_path)
            start_step = int(blob["step"])
            leaves, treedef = jax.tree_util.tree_flatten(
                jax.eval_shape(tx.init, variables))
            opt_state = jax.tree_util.tree_unflatten(
                treedef, [jnp.asarray(blob[f"leaf_{i}"])
                          for i in range(len(leaves))])
            click.echo(f"resumed from {ckpt_path} at step {start_step} "
                       "(optimizer state restored)")
        else:
            click.echo(f"resumed weights from {ckpt_path} (no "
                       ".trainstate.npz: optimizer moments start fresh)")
    else:
        variables = registry.init_variables(spec, seed)
    if opt_state is None:
        opt_state = jax.jit(tx.init)(variables)
    step_fn = train.make_train_step(spec, tx)

    # the data stream is reseeded by start_step so a resumed run does not
    # replay the crops the interrupted run already consumed
    data_seed = seed + start_step
    if images:
        pairs = data_mod.list_pairs(images, labels)
        click.echo(f"{len(pairs)} image/label pairs")
        it = data_mod.crop_batches(pairs, batch, spec.input_height,
                                   spec.input_width, spec.n_classes,
                                   data_seed)
    else:
        click.echo(f"synthetic '{role}' task")
        it = data_mod.synthetic_batches(role, batch, spec.input_height,
                                        spec.input_width, data_seed)

    if len(devices) > 1:
        mesh = mesh_mod.make_mesh(devices, model_parallel=model_parallel)
        click.echo(f"mesh: {mesh}")
        variables = mesh_mod.shard_tree(
            variables, mesh_mod.param_shardings(mesh, variables))
        step_fn = jax.jit(step_fn)

        def put(imgs, labs):
            return (jax.device_put(jnp.asarray(imgs),
                                   mesh_mod.batch_sharding(mesh)),
                    jax.device_put(jnp.asarray(labs),
                                   mesh_mod.label_sharding(
                                       mesh, np.asarray(labs).ndim)))
    else:
        step_fn = jax.jit(step_fn)

        def put(imgs, labs):
            return jnp.asarray(imgs), jnp.asarray(labs)

    os.makedirs(out, exist_ok=True)

    def save(step_now):
        checkpoint.save(ckpt_path, spec,
                        jax.tree_util.tree_map(np.asarray, variables))
        leaves = jax.tree_util.tree_leaves(opt_state)
        np.savez(state_path, step=np.int64(step_now),
                 **{f"leaf_{i}": np.asarray(v)
                    for i, v in enumerate(leaves)})

    t0 = time.time()
    for i in range(start_step, start_step + steps):
        imgs, labs = next(it)
        variables, opt_state, loss = step_fn(variables, opt_state,
                                             *put(imgs, labs))
        if (i - start_step) % log_every == 0 or \
                i == start_step + steps - 1:
            click.echo(f"step {i}: loss {float(loss):.4f} "
                       f"({time.time() - t0:.1f}s)")
        if save_every and (i + 1 - start_step) % save_every == 0:
            save(i + 1)
            click.echo(f"checkpointed at step {i + 1}")

    save(start_step + steps)
    click.echo(f"saved {ckpt_path}")


if __name__ == "__main__":
    main()
