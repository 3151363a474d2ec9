"""``notorch-tpu-predict``: standalone inference from a checkpoint.

Completes the reference's inference path (``trainer.predict`` ->
``NotorchModel.predict_step``, reference lightning_models/model.py:267-271)
as a deployable entry point: rebuild the model from the ``predict_meta.json``
written by training (model/optimizer config + task transforms baked from
TRAINING-split statistics), restore the latest (or a chosen) checkpoint, run
the jitted predict step over a CSV of molecules, and write denormalized
predictions aligned row-for-row with the input.

Usage::

    notorch-tpu-predict CHECKPOINT_DIR INPUT.csv -o preds.csv [--step N]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def run_predict(
    checkpoint_dir: str | Path,
    csv: str | Path,
    out: str | Path | None = None,
    batch_size: int = 64,
    smiles_col: str | None = None,
    step: int | None = None,
):
    """Returns ``{column_name: np.ndarray[n]}`` and optionally writes a CSV."""
    import jax
    import numpy as np

    from notorch_tpu.cli.train import build_dataset, build_model, build_optimizer
    from notorch_tpu.data.batching import DataLoader
    from notorch_tpu.tasks import transforms as task_transforms
    from notorch_tpu.training.checkpoint import Checkpointer
    from notorch_tpu.training.loop import predict
    from notorch_tpu.utils import enable_compilation_cache

    # a cold serving process re-compiles every bucket shape without this
    # (measured 3.3x cold/warm end to end on v5e — BASELINE.md round 4)
    enable_compilation_cache()

    meta_path = Path(checkpoint_dir) / "predict_meta.json"
    if not meta_path.exists():
        raise FileNotFoundError(
            f"{meta_path} not found — train with trainer.checkpoint_dir set to produce it"
        )
    meta = json.loads(meta_path.read_text())
    pred_key = meta["pred_key"]

    transforms = {
        name: {
            "preds": {"module": task_transforms.deserialize(t["preds"]), "key": pred_key},
            "targets": {
                "module": task_transforms.deserialize(t["targets"]),
                "key": f"targets.{name}",
            },
        }
        for name, t in meta["transforms"].items()
    }
    model_cfg = dict(meta["model"])
    if model_cfg.get("kind", "dmpnn") == "dmpnn" and "modules" not in model_cfg:
        # metas written by current trainers store the resolved layout; this
        # covers hand-written metas that still say "auto"
        from notorch_tpu.models.dmpnn import resolve_layout

        model_cfg["layout"] = resolve_layout(
            model_cfg.get("layout", "auto"),
            dropout=model_cfg.get("dropout", 0.0),
            dtype=model_cfg.get("dtype"),
            graph_axis=model_cfg.get("graph_axis"),
            remat=model_cfg.get("remat", False),
            impl=model_cfg.get("impl", "gather"),
            aggregation=model_cfg.get("aggregation", "mean"),
        )
        meta = dict(meta)
        meta["model"] = model_cfg
    elif model_cfg.get("kind") in ("gat", "graph_transformer"):
        from notorch_tpu.models.gat import resolve_gat_layout

        attention = model_cfg.get(
            "attention", "sdp" if model_cfg["kind"] == "graph_transformer" else "gatv2"
        )
        model_cfg["layout"] = resolve_gat_layout(
            model_cfg.get("layout", "auto"), attention=attention
        )
        meta = dict(meta)
        meta["model"] = model_cfg
    model = build_model(model_cfg, transforms, build_optimizer(meta.get("optimizer")))

    data_cfg = dict(meta.get("data") or {})
    data_cfg["csv"] = str(csv)
    if smiles_col:
        data_cfg["smiles_col"] = smiles_col
    ds = build_dataset(data_cfg)  # no targets: inference CSVs need only molecules

    model_layout = str(meta["model"].get("layout", "flat"))
    if model_layout == "dense_packed":
        layout = "dense_packed"
    elif model_layout.startswith("dense"):
        layout = "dense"
    else:
        layout = "flat"
    loader_kwargs = {}
    if meta["model"].get("kind") in ("gat", "graph_transformer"):
        from notorch_tpu.models.gat import gat_loader_kwargs

        # lane-aligned bins, matching the training loader
        loader_kwargs = gat_loader_kwargs(layout)
    loader = DataLoader(ds, batch_size=batch_size, layout=layout, **loader_kwargs)

    state = model.init(jax.random.PRNGKey(0), next(iter(loader)))
    state = Checkpointer(checkpoint_dir).restore(state, step=step)
    preds = predict(model, state.params, loader, keys=[pred_key], extra_vars=state.extra_vars)
    flat = np.asarray(preds[pred_key])[: len(ds)].reshape(len(ds), -1)

    names = _column_names(meta["transforms"], flat.shape[1])
    result = {name: flat[:, i] for i, name in enumerate(names)}
    if out:
        with open(out, "w") as f:
            f.write(",".join(names) + "\n")
            for row in flat:
                f.write(",".join(f"{v:.6g}" for v in row) + "\n")
    return result


def _column_names(transform_meta: dict, width: int) -> list[str]:
    """Use the training target column names when the prediction width matches
    them exactly; otherwise (multi-channel heads like MVE/evidential/
    dirichlet) fall back to positional names."""
    columns = [c for t in transform_meta.values() for c in t.get("columns", [])]
    if len(columns) == width:
        return [str(c) for c in columns]
    return [f"pred_{i}" for i in range(width)]


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="notorch-tpu-predict", description=__doc__)
    parser.add_argument("checkpoint_dir", help="directory written by trainer.checkpoint_dir")
    parser.add_argument("csv", help="input CSV of molecules")
    parser.add_argument("-o", "--out", default="predictions.csv", help="output CSV path")
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--smiles-col", default=None, help="override the SMILES column name")
    parser.add_argument("--step", type=int, default=None, help="checkpoint step (default latest)")
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    run_predict(
        args.checkpoint_dir,
        args.csv,
        out=args.out,
        batch_size=args.batch_size,
        smiles_col=args.smiles_col,
        step=args.step,
    )
    print(json.dumps({"predictions_csv": args.out}))


if __name__ == "__main__":
    main()
