"""mft_tpu — TPU-native cross-domain few-shot meta fine-tuning framework.

A brand-new JAX / XLA / Pallas / pjit implementation of the capabilities of
johncai117/Meta-Fine-Tuning (CVPR 2020 CDFSL challenge, 2nd place; paper
arXiv:2005.10544): supervised ResNet-10 backbone pretraining, episodic
meta-training of ProtoNet / GNN / DampNet heads, first-order-MAML
"meta fine-tuning", and cross-domain few-shot evaluation with per-episode
transfer fine-tuning, support-set augmentation, and score ensembling.

Designed TPU-first rather than ported:

* episodes are HBM-resident ``[n_way, n_support+n_query, H, W, 3]`` tensors,
* models are pure functions over parameter pytrees (no module mutation),
* the per-episode fine-tune inner loop is a jitted ``lax.scan`` that is
  ``vmap``-ed across episodes and sharded over a ``jax.sharding.Mesh``,
* data augmentation (random-resized-crop / jitter / flips / normalize) runs
  fused on device, fanned out over the ``gen_examples + 2`` replica axis.

Layer map (mirrors SURVEY.md §1 of the reference analysis):

=========  ====================================================================
``cli``    drivers: ``train``, ``train_50``, ``finetune``, ``finetune_50``
``methods``meta-learners: Baseline, ProtoNet, GnnNet, GnnNet50, DampNet
``models`` backbone zoo (ResNet10/10_FW/18/34) and the episodic GNN head
``train``  optimizers, inner-loop engines (meta fine-tune + eval transfer)
``data``   dataset registry, episodic samplers, on-device augmentation
``ops``    functional NN ops (conv/BN/pool/init) + Pallas TPU kernels
``parallel`` device mesh + sharding helpers
``utils``  checkpointing, metrics, logging
=========  ====================================================================
"""

__version__ = "0.1.0"
