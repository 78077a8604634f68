"""BC training CLI (reference: dm_control/scripts/train.py:13-95).

    python -m dm_control_tpu.scripts.train --dataset=data.hdf5 \
        --model=gpt --block_size=4 --max_epochs=10
"""

from __future__ import annotations

from absl import app, flags, logging

FLAGS = flags.FLAGS
flags.DEFINE_string("checkpoint_path", "saved_model.msgpack",
                    "Path to save model checkpoints")
flags.DEFINE_string("config_path", "saved_model_config.json",
                    "Path to save model config")
flags.DEFINE_string("dataset", "trajectory_dataset.hdf5", "Dataset path.")
flags.DEFINE_string("test_dataset", "", "Optional held-out dataset path.")
flags.DEFINE_integer("max_epochs", 10, "Maximum training epochs.")
flags.DEFINE_integer("batch_size", 64, "Batch size.")
flags.DEFINE_float("learning_rate", 1e-4, "Learning rate")
flags.DEFINE_float("grad_norm_clip", 5.0, "Clip gradient norm")
flags.DEFINE_integer("block_size", 4, "History/context length.")
flags.DEFINE_integer("gpt_layers", 8, "GPT layers")
flags.DEFINE_integer("gpt_heads", 8, "GPT heads")
flags.DEFINE_integer("gpt_embd", 512, "GPT embedding size")
flags.DEFINE_list("observables", "", "Observables to use (default all).")
flags.DEFINE_boolean("lr_decay", False, "Decay learning rate.")
flags.DEFINE_integer("warmup_tokens", 512 * 20, "Warmup tokens.")
flags.DEFINE_integer("final_tokens", 10 * 200000, "Decay horizon tokens.")
flags.DEFINE_string("model", "gpt", "Choices: gpt/ffnet")
flags.DEFINE_integer("num_workers", 0, "Native prefetch threads "
                     "(0 = in-process numpy batches).")


def train():
    """reference train.py:31-95."""
    from dm_control_tpu.scripts.dataset import TrajectoryDataset
    from dm_control_tpu.scripts.model import (FFConfig, FFNet, GPT,
                                              GPTConfig)
    from dm_control_tpu.scripts.trainer import Trainer, TrainerConfig

    block = FLAGS.block_size if FLAGS.model == "gpt" else 1
    train_ds = TrajectoryDataset(FLAGS.dataset, block,
                                 FLAGS.observables or None)
    test_ds = None
    if FLAGS.test_dataset:
        test_ds = TrajectoryDataset(FLAGS.test_dataset, block,
                                    FLAGS.observables or None)

    if FLAGS.model == "gpt":
        config = GPTConfig(train_ds.observation_size,
                           train_ds.action_size, block,
                           n_layer=FLAGS.gpt_layers,
                           n_head=FLAGS.gpt_heads,
                           n_embd=FLAGS.gpt_embd)
        model = GPT(config)
    elif FLAGS.model == "ffnet":
        config = FFConfig(train_ds.observation_size, train_ds.action_size)
        model = FFNet(config)
    else:
        raise ValueError(f"unknown model {FLAGS.model!r}")
    config.to_json(FLAGS.config_path)

    tconf = TrainerConfig(
        max_epochs=FLAGS.max_epochs, batch_size=FLAGS.batch_size,
        learning_rate=FLAGS.learning_rate,
        grad_norm_clip=FLAGS.grad_norm_clip, lr_decay=FLAGS.lr_decay,
        warmup_tokens=FLAGS.warmup_tokens, final_tokens=FLAGS.final_tokens,
        ckpt_path=FLAGS.checkpoint_path, num_workers=FLAGS.num_workers)
    trainer = Trainer(model, train_ds, test_ds, tconf)
    history = trainer.train()
    logging.info("best loss: %f", trainer.best_loss)
    return history


def log_flags(fl):
    """reference train.py:81-86."""
    for name in fl:
        logging.info("%s: %s", name, fl[name].value)


def main(argv):
    del argv
    train()


if __name__ == "__main__":
    app.run(main)
