"""Example: D-MPNN regression on a SMILES CSV (the ESOL/Lipophilicity shape).

    python examples/train_regression.py tests/data/lipo.csv --target lipo --epochs 10
"""

import argparse

import jax
import optax
import pandas as pd

from notorch_tpu.data.batching import DataLoader, Subset, random_split
from notorch_tpu.data.dataset import MolecularDataset, TargetSpec, TransformManager
from notorch_tpu.models.dmpnn import build_dmpnn
from notorch_tpu.training.loop import evaluate, fit, predict
from notorch_tpu.training.logging import StdoutLogger
from notorch_tpu.transforms import MolToGraph, Pipeline, SmiToMol


def main():
    p = argparse.ArgumentParser()
    p.add_argument("csv")
    p.add_argument("--smiles-col", default="smiles")
    p.add_argument("--target", default="y")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--layout", default="flat", choices=["auto", "flat", "dense", "dense_fused", "dense_packed"])
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    df = pd.read_csv(args.csv)
    ds = MolecularDataset(
        df,
        transforms={
            "g": TransformManager(Pipeline(SmiToMol(), MolToGraph()), in_key=args.smiles_col)
        },
        targets={"y": TargetSpec(columns=[args.target], task="regression")},
    )
    train_idx, test_idx = random_split(len(ds), (0.9, 0.1), seed=0)
    train, test = Subset(ds, train_idx), Subset(ds, test_idx)

    transforms = train.build_task_transform_configs()
    transforms["y"]["preds"]["key"] = "ffn.preds"
    from notorch_tpu.models.dmpnn import resolve_layout

    layout = resolve_layout(args.layout)  # "auto" -> fastest valid layout
    model = build_dmpnn(
        hidden_dim=args.hidden,
        depth=3,
        layout=layout,
        transforms=transforms,
        optimizer=optax.adam(1e-3),
    )

    # the loader layout must match the model's resolved layout
    if layout == "dense_packed":
        data_layout = "dense_packed"
    elif layout.startswith("dense"):
        data_layout = "dense"
    else:
        data_layout = "flat"
    train_loader = DataLoader(
        train, batch_size=args.batch_size, shuffle=True, seed=0, layout=data_layout,
        sort_by_size=data_layout == "dense",
    )
    test_loader = DataLoader(test, batch_size=args.batch_size, layout=data_layout)

    state = model.init(jax.random.PRNGKey(0), next(iter(train_loader)))
    result = fit(model, state, train_loader, epochs=args.epochs, log_fn=StdoutLogger())
    print("test:", evaluate(model, result.state.params, test_loader))

    preds = predict(model, result.state.params, test_loader, keys=["ffn.preds"])
    print("first predictions (data units):", preds["ffn.preds"][:5, 0])


if __name__ == "__main__":
    main()
