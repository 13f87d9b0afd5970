"""Shared test fixture: build a synthetic Keras-layout .h5 whose layer
names match the canonical ResNet50-UNet the reference checkpoints use, with
shapes taken from our own ResNet50Unet variable tree."""

import json

import numpy as np

from sbb_textline_detection_tpu.models import h5_import


def build_fake_keras_h5(path, variables, rng, with_model_config=None):
    """Write a .h5 at `path` matching `variables` (a ResNet50Unet tree).
    with_model_config: optional (h, w) to embed as batch_input_shape."""
    import h5py

    params = variables["params"]
    stats = variables["batch_stats"]

    def node_at(tree, p):
        node = tree
        for k in p:
            node = node[k]
        return node

    layer_names = []
    with h5py.File(path, "w") as f:
        if with_model_config is not None:
            h, w = with_model_config
            cfg = {"config": {"layers": [
                {"config": {"batch_input_shape": [None, h, w, 3]}}]}}
            f.attrs["model_config"] = json.dumps(cfg)
        g = f.create_group("model_weights")

        def add_conv(keras_name, flax_path):
            node = node_at(params, flax_path)
            lg = g.create_group(keras_name)
            names = []
            for leaf in ("kernel", "bias"):
                if leaf in node:
                    wn = f"{keras_name}/{leaf}:0"
                    lg.create_dataset(
                        wn, data=rng.normal(size=node[leaf].shape)
                        .astype(np.float32))
                    names.append(wn.encode())
            lg.attrs["weight_names"] = names
            layer_names.append(keras_name.encode())

        def add_bn(keras_name, flax_path):
            pnode = node_at(params, flax_path)
            snode = node_at(stats, flax_path)
            lg = g.create_group(keras_name)
            names = []
            for leaf, src in (("gamma", pnode["scale"]),
                              ("beta", pnode["bias"]),
                              ("moving_mean", snode["mean"]),
                              ("moving_variance", snode["var"])):
                wn = f"{keras_name}/{leaf}:0"
                lg.create_dataset(wn, data=rng.normal(size=src.shape)
                                  .astype(np.float32))
                names.append(wn.encode())
            lg.attrs["weight_names"] = names
            layer_names.append(keras_name.encode())

        add_conv("conv1", ("conv1",))
        add_bn("bn_conv1", ("bn_conv1", "BatchNorm_0"))
        stages = {2: "abc", 3: "abcd", 4: "abcdef", 5: "abc"}
        for s, blocks in stages.items():
            for b in blocks:
                base = f"res{s}{b}"
                for br, (cv, bn) in h5_import._BRANCH_TO_FLAX.items():
                    if br == "1" and b != "a":
                        continue
                    add_conv(f"res{s}{b}_branch{br}", (base, cv))
                    add_bn(f"bn{s}{b}_branch{br}", (base, bn, "BatchNorm_0"))
        for i, name in enumerate(h5_import._DECODER_CONVS):
            add_conv(f"conv2d_{i+1}", (name,))
        for i, name in enumerate(h5_import._DECODER_BNS):
            add_bn(f"batch_normalization_{i+1}", (name, "BatchNorm_0"))
        g.attrs["layer_names"] = layer_names
