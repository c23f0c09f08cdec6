"""Experiment config tree.

Mirrors every stanza of the reference experiment config
(/root/reference/robo_vln_baselines/config/default.py:10-290) so the paper
configs port unchanged, and adds a TPU stanza (mesh axes, precision, remat,
bucketing) that replaces the reference's GPU/DDP knobs with jax.sharding
equivalents.
"""

from typing import List, Optional, Union

from .task import get_task_config
from .tree import ConfigTree

_C = ConfigTree()
_C.BASE_TASK_CONFIG_PATH = ""
_C.TASK_CONFIG = ConfigTree()
_C.CMD_TRAILING_OPTS = []
_C.TRAINER_NAME = "robo_vln_trainer"
_C.ENV_NAME = "VLNCEDaggerEnv"
_C.SIMULATOR_GPU_ID = [0]
_C.NUM_PROCESSES = 1
_C.VIDEO_OPTION = []
_C.VIDEO_DIR = "videos/debug"
_C.TENSORBOARD_DIR = "data/tensorboard_dirs/debug"
_C.SENSORS = ["RGB_SENSOR", "DEPTH_SENSOR"]
_C.CHECKPOINT_FOLDER = "data/checkpoints"
_C.LOG_FILE = "train.log"
_C.EVAL_CKPT_PATH_DIR = "data/checkpoints"
_C.PLOT_ATTENTION = False
_C.BERT_VOCAB_FILE = ""  # wordpiece vocab for the is_bert instruction path

# ---------------------------------------------------------------------------
# TPU / parallelism (replaces the reference DDP stanza, config/default.py:32-38;
# NCCL process groups become a jax.sharding.Mesh over ICI)
# ---------------------------------------------------------------------------
_C.TPU = ConfigTree()
_C.TPU.MESH_AXES = ["data", "model"]
_C.TPU.MESH_SHAPE = [-1, 1]  # -1: all devices on the data axis
_C.TPU.PRECISION = "bfloat16"  # compute dtype for encoders/attention
_C.TPU.PARAM_DTYPE = "float32"
# jax.checkpoint over the whole loss forward. Off by default: the frozen
# trunks are stop_gradient'd (no backward through them), so full-graph remat
# just re-runs them — measured 1384 vs 2231 frames/s train step at B=4,T=50
# on v5e. Turn on when activation memory caps the per-chip batch.
_C.TPU.REMAT = False
_C.TPU.DONATE = True  # donate train state buffers in the jitted step
_C.TPU.USE_PALLAS = True  # fused kernels where profitable (falls back off-TPU)
# Compute the frozen conv trunks (DDPPO depth + torchvision rgb ResNet50s)
# ONCE per hierarchical step and feed both policies — the reference runs
# them twice with identical frozen weights (resnet_encoders.py:35-51,144).
# Auto-disabled (with a log line) when the two policies' trunk weights are
# not bitwise identical, so correctness never depends on the flag.
_C.TPU.SHARE_FROZEN_TRUNKS = True
# overwrite the low level's frozen trunks with copies of the high level's at
# policy setup (models.sync_frozen_trunks) — random-init smokes/studies only;
# real pretrained files already make them identical
_C.TPU.SYNC_FROZEN_TRUNKS_ON_INIT = False
# EXPLICIT DEVIATION (default off): apply MODEL.inflection_weight_coef to the
# high-level sub-goal CE (ops/losses.inflection_weights).  The reference
# computes inflec_weights and never uses them (hierarchical_trainer.py:183,
# robo_vln_trainer.py:195 — PARITY.md preserved no-op); this flag turns the
# shipped-but-dead coefficient into habitat-style IW loss weighting.
# Gated on DAGGER.USE_IW too, matching the key that promises the behavior.
_C.TPU.APPLY_INFLECTION_WEIGHTS = False
# EXPLICIT DEVIATION (default off): mask the velocity MSE by per-step
# VALIDITY instead of the reference's target != 0 fill
# (robo_vln_trainer.py:521-527, ops/losses.masked_velocity_mse).  The
# reference quirk silently drops any velocity component whose label is
# exactly 0.0; with a synthetic P-controller expert (LangNav) omega is
# exactly 0.0 on every straight segment, so the steering head never learns
# to go straight and the closed-loop rollout carries a compounding turn
# bias (round-4 probe_policy finding).  ops/losses.validmask_velocity_mse.
_C.TPU.VALID_MASK_VELOCITY_MSE = False
# fused attention kernel (ops/pallas_attention.py): parity-tested but measured
# SLOWER than XLA at HCM shapes on v5e (N=200,L=200,S=16,h=4: 960us vs 149us —
# the op is too small; XLA's batched dot_general wins), so off by default
_C.TPU.PALLAS_ATTENTION = False

# ---------------------------------------------------------------------------
# EVAL (reference config/default.py:44-52)
# ---------------------------------------------------------------------------
_C.EVAL = ConfigTree()
_C.EVAL.SPLIT = "val_seen"
# folder-sweep mode: ONCE=True evaluates the checkpoints present and exits;
# ONCE=False is the reference's eval daemon (habitat BaseRLTrainer.eval polls
# EVAL_CKPT_PATH_DIR for NEW checkpoints forever, README.md:209) so eval runs
# concurrently with training.  POLL_IDLE_TIMEOUT_SEC=0 waits forever
# (reference behavior); >0 exits that long after the last new checkpoint.
_C.EVAL.ONCE = True
_C.EVAL.POLL_INTERVAL_SEC = 2.0
_C.EVAL.POLL_IDLE_TIMEOUT_SEC = 0.0
_C.EVAL.USE_CKPT_CONFIG = True
_C.EVAL.EPISODE_COUNT = 2
# batched closed-loop eval: N envs stepped in parallel, ONE policy program
# over the batch (TPU-native — eval wall time scales ~1/N; the reference is
# single-env). 1 = the reference-faithful single-env driver incl. videos.
_C.EVAL.NUM_ENVS = 1
# On-device closed-loop eval (kinematic backend only): the whole rollout —
# velocity integration, procedural observations, polyline geodesics, policy
# tick, termination — is ONE jitted lax.while_loop program; one transfer per
# episode batch instead of one round trip per 30 Hz tick (eval/ondevice.py).
# Fast path: float32 device sim, not bit-identical to the float64 host sim.
_C.EVAL.ON_DEVICE = False
_C.EVAL.ON_DEVICE_BATCH = 8
# Language-grounding control (no reference equivalent): evaluate with every
# episode carrying ANOTHER episode's instruction (deterministic rotation,
# same start pose/path/metrics).  Grounded policies collapse toward the
# nonlearning baseline; path-prior memorizers don't (evaluator.py
# shuffle_instructions; used by scripts/convergence_study.py).
_C.EVAL.SHUFFLE_INSTRUCTIONS = False
_C.EVAL.EVAL_NONLEARNING = False
_C.EVAL.NONLEARNING = ConfigTree()
_C.EVAL.NONLEARNING.AGENT = "RandomAgent"
_C.EVAL.VAL_LOG_DIR = "validation_logging"
# per-episode position traces -> <writer.log_dir>/trajectories.jsonl; feeds
# the device-vs-host eval-driver parity study (scripts/eval_parity.py)
_C.EVAL.DUMP_TRAJECTORIES = False

# ---------------------------------------------------------------------------
# DAGGER / IL loop (reference config/default.py:57-84)
# ---------------------------------------------------------------------------
_C.DAGGER = ConfigTree()
_C.DAGGER.LR = 1e-4
# high-level CyclicLR schedule (reference hardcodes these in the torch
# CyclicLR ctor, hierarchical_trainer.py:337; configurable here so small
# studies can shorten the ramp)
_C.DAGGER.CYCLIC_BASE_LR = 2e-6
_C.DAGGER.CYCLIC_MAX_LR = 1e-4
_C.DAGGER.CYCLIC_STEP_SIZE_UP = 1000
_C.DAGGER.CYCLIC_STEP_SIZE_DOWN = 30000
_C.DAGGER.ITERATIONS = 1
_C.DAGGER.EPOCHS = 10
_C.DAGGER.UPDATE_SIZE = 5000
_C.DAGGER.BATCH_SIZE = 3
_C.DAGGER.P = 1.0
_C.DAGGER.time_step = 1.0 / 30
_C.DAGGER.LMDB_MAP_SIZE = 2.7e12
_C.DAGGER.LMDB_EVAL_SIZE = 1e11
_C.DAGGER.tbptt_steps = 100
_C.DAGGER.split_dim = 0
_C.DAGGER.COLLECT_DATA_SPLIT = "train"
_C.DAGGER.INTER_MODULE_ATTN = False
_C.DAGGER.LMDB_COMMIT_FREQUENCY = 500
_C.DAGGER.LMDB_STORE_FREQUENCY = 5
_C.DAGGER.USE_IW = True
# >1: decode+collate in that many worker PROCESSES shipping batches through
# shared memory (data/parallel_loader.py) — the multi-core answer to the
# reference's single-worker DataLoader (robo_vln_trainer.py:919-927).
# 0/1 keeps the in-process loader; batch order depends on the worker count.
_C.DAGGER.LOADER_WORKERS = 0
# DART-style recovery demonstrations (Laskey et al. 2017), default off:
# during expert collection, EXECUTE velocity commands perturbed by zero-mean
# gaussian noise (std = this value, on both v and omega) while RECORDING the
# expert's clean action as the label.  The buffer then contains observations
# slightly off the expert manifold with corrective supervision — the cheap
# counter to pure-BC closed-loop compounding when DAGGER.P=1 (the reference
# trains pure teacher forcing and has no equivalent).
_C.DAGGER.COLLECT_ACTION_NOISE = 0.0
_C.DAGGER.PRELOAD_LMDB_FEATURES = False
# with PRELOAD=False: collect inside the DAgger loop then CONTINUE into
# training (one-command workflow). COLLECT_ONLY=True reproduces the
# reference's collect-then-stop (robo_vln_trainer.py:898-903 `break`) for the
# data-collection yamls.
_C.DAGGER.COLLECT_ONLY = False
_C.DAGGER.LMDB_FEATURES_DIR = "data/trajectories_dirs/debug/trajectories.lmdb"
_C.DAGGER.LMDB_EVAL_DIR = "data/trajectories_dirs/debug/trajectories.lmdb"
_C.DAGGER.LOAD_FROM_CKPT = False
_C.DAGGER.CKPT_TO_LOAD = "data/checkpoints/ckpt.0"
# Resume the epoch loop from the newest ckpt.{EPOCHS+k} in CHECKPOINT_FOLDER
# (full train state + optimizer + LR-scheduler position + TB step counters;
# data order and dropout streams are epoch/step-keyed, so a resumed run
# reproduces an uninterrupted one exactly).  The reference can only restart
# from scratch (it saves per epoch, robo_vln_trainer.py:720-722, but never
# restores mid-run).  Intended for the offline PRELOAD pipeline
# (ITERATIONS=1, all paper configs).
_C.DAGGER.RESUME = False
# Stop after N epochs in this process (0 = run to DAGGER.EPOCHS).  With
# RESUME=True this bounds per-process lifetime for preemptible or
# resource-leaky hosts (docs/TPU_ENV_NOTES.md: the tunneled TPU client pins
# every host->device transfer buffer until process exit).
_C.DAGGER.MAX_EPOCHS_PER_RUN = 0
# Feature-store training (training/featurize.py): run the frozen conv trunks
# over the buffer ONCE (cached in <buffer>.features, fingerprint-keyed), then
# train from features — the step shrinks to the trainable stack.  Requires
# the resnet encoder types; trunk weights must be identical across the
# hierarchical pair (auto-checked, falls back to raw training otherwise).
_C.DAGGER.PRELOAD_TRUNK_FEATURES = False
# TPU additions: static-shape episode bucketing (SURVEY.md §7 hard parts)
_C.DAGGER.EPISODE_LEN_BUCKETS = [100, 200, 300, 400, 500, 700, 1000]
_C.DAGGER.MAX_INSTRUCTION_LEN = 200

# ---------------------------------------------------------------------------
# MODEL (reference config/default.py:88-258)
# ---------------------------------------------------------------------------
_C.MODEL = ConfigTree()
_C.MODEL.inflection_weight_coef = 3.2
_C.MODEL.ablate_depth = False
_C.MODEL.ablate_rgb = False
_C.MODEL.ablate_instruction = False

_C.MODEL.INSTRUCTION_ENCODER = ConfigTree()
_C.MODEL.INSTRUCTION_ENCODER.num_layers = 1
_C.MODEL.INSTRUCTION_ENCODER.vocab_size = 2504
_C.MODEL.INSTRUCTION_ENCODER.max_length = 200
_C.MODEL.INSTRUCTION_ENCODER.use_pretrained_embeddings = True
_C.MODEL.INSTRUCTION_ENCODER.embedding_file = (
    "data/datasets/robo_vln_v1/embeddings.json.gz"
)
_C.MODEL.INSTRUCTION_ENCODER.fine_tune_embeddings = False
# inert in the reference too (only a docstring mentions it)
_C.MODEL.INSTRUCTION_ENCODER.dataset_vocab = (
    "data/datasets/R2R_VLNCE_v1_preprocessed/train/train.json.gz"
)
_C.MODEL.INSTRUCTION_ENCODER.embedding_size = 50
_C.MODEL.INSTRUCTION_ENCODER.hidden_size = 256
_C.MODEL.INSTRUCTION_ENCODER.rnn_type = "LSTM"
_C.MODEL.INSTRUCTION_ENCODER.final_state_only = True
_C.MODEL.INSTRUCTION_ENCODER.bidirectional = False
_C.MODEL.INSTRUCTION_ENCODER.dropout_ratio = 0.25
_C.MODEL.INSTRUCTION_ENCODER.is_bert = False

_C.MODEL.TRANSFORMER_INSTRUCTION_ENCODER = ConfigTree()
_C.MODEL.TRANSFORMER_INSTRUCTION_ENCODER.N = 1
_C.MODEL.TRANSFORMER_INSTRUCTION_ENCODER.d_in = 768
_C.MODEL.TRANSFORMER_INSTRUCTION_ENCODER.d_model = 256
_C.MODEL.TRANSFORMER_INSTRUCTION_ENCODER.h = 4
_C.MODEL.TRANSFORMER_INSTRUCTION_ENCODER.d_ff = 1024
_C.MODEL.TRANSFORMER_INSTRUCTION_ENCODER.dropout = 0.2
_C.MODEL.TRANSFORMER_INSTRUCTION_ENCODER.is_bert = True

_C.MODEL.IMAGE_CROSS_MODAL_ENCODER = ConfigTree()
_C.MODEL.IMAGE_CROSS_MODAL_ENCODER.N = 1
_C.MODEL.IMAGE_CROSS_MODAL_ENCODER.d_in = 512
_C.MODEL.IMAGE_CROSS_MODAL_ENCODER.d_out = 256
_C.MODEL.IMAGE_CROSS_MODAL_ENCODER.d_model = 256
_C.MODEL.IMAGE_CROSS_MODAL_ENCODER.h = 2
_C.MODEL.IMAGE_CROSS_MODAL_ENCODER.d_ff = 1024
_C.MODEL.IMAGE_CROSS_MODAL_ENCODER.dropout = 0.2

_C.MODEL.VISUAL_LING_ATTN = ConfigTree()
_C.MODEL.VISUAL_LING_ATTN.N = 1
_C.MODEL.VISUAL_LING_ATTN.vis_in_features = 256
_C.MODEL.VISUAL_LING_ATTN.ins_in_features = 768
_C.MODEL.VISUAL_LING_ATTN.fc_output = 512
_C.MODEL.VISUAL_LING_ATTN.d_model = 256
_C.MODEL.VISUAL_LING_ATTN.h = 4
_C.MODEL.VISUAL_LING_ATTN.d_ff = 1024
_C.MODEL.VISUAL_LING_ATTN.dropout = 0.25

# ---------------------------------------------------------------------------
# Dead-in-the-reference stanzas, carried INERT for config-surface parity:
# nothing in the reference consumes any of these outside its config file
# (verified by grep over robo_vln_baselines), but user yamls / CLI overrides
# that set them must keep porting verbatim.  Reference config/default.py
# lines: INTER_MODULE_ATTN :146-153, ACTION_DECODER_TRANFORMER (sic),
# HYBRID_STATE_DECODER, SEM_* semantic-map stanzas, LANG_ATTN, FLAT_AUX_LOSS,
# HIERARCHICAL, ablate_sem_attn, dataset_vocab, scheduler_patience; DDP
# :32-38 (NCCL knobs replaced by the TPU stanza); TORCH_GPU_ID.
# ---------------------------------------------------------------------------
_C.TORCH_GPU_ID = 0
_C.DDP = ConfigTree()
_C.DDP.distributed = False
_C.DDP.world_size = 1
_C.DDP.rank = 0
_C.DDP.gpu = 0
_C.DDP.dist_url = "env://"
_C.DDP.dist_backend = "nccl"
_C.MODEL.HIERARCHICAL = True
_C.MODEL.ablate_sem_attn = False
_C.MODEL.FLAT_AUX_LOSS = ConfigTree()
_C.MODEL.FLAT_AUX_LOSS.use = False
_C.MODEL.LANG_ATTN = ConfigTree()
_C.MODEL.LANG_ATTN.use = False
_C.MODEL.LANG_ATTN.hidden_size = 512
_C.MODEL.SEM_ATTN_ENCODER = ConfigTree()
_C.MODEL.SEM_ATTN_ENCODER.use = False
_C.MODEL.SEM_ATTN_ENCODER.hidden_size = 512
_C.MODEL.SEM_TEXT_ATTN = ConfigTree()
_C.MODEL.SEM_TEXT_ATTN.use = False
_C.MODEL.SEM_TEXT_ATTN.hidden_size = 512
_C.MODEL.INTER_MODULE_ATTN = ConfigTree()
_C.MODEL.INTER_MODULE_ATTN.N = 1
_C.MODEL.INTER_MODULE_ATTN.in_features = 512
_C.MODEL.INTER_MODULE_ATTN.fc_output = 512
_C.MODEL.INTER_MODULE_ATTN.d_model = 512
_C.MODEL.INTER_MODULE_ATTN.h = 4
_C.MODEL.INTER_MODULE_ATTN.d_ff = 1024
_C.MODEL.INTER_MODULE_ATTN.dropout = 0.1
_C.MODEL.ACTION_DECODER_TRANFORMER = ConfigTree()  # (sic — reference typo)
_C.MODEL.ACTION_DECODER_TRANFORMER.N = 1
_C.MODEL.ACTION_DECODER_TRANFORMER.in_features = 512
_C.MODEL.ACTION_DECODER_TRANFORMER.fc_output = 512
_C.MODEL.ACTION_DECODER_TRANFORMER.d_model = 512
_C.MODEL.ACTION_DECODER_TRANFORMER.h = 4
_C.MODEL.ACTION_DECODER_TRANFORMER.d_ff = 1024
_C.MODEL.ACTION_DECODER_TRANFORMER.dropout = 0.1
_C.MODEL.HYBRID_STATE_DECODER = ConfigTree()
_C.MODEL.HYBRID_STATE_DECODER.N = 1
_C.MODEL.HYBRID_STATE_DECODER.d_in = 512
_C.MODEL.HYBRID_STATE_DECODER.d_model = 512
_C.MODEL.HYBRID_STATE_DECODER.d_out = 512
_C.MODEL.HYBRID_STATE_DECODER.d_ff = 1024
_C.MODEL.HYBRID_STATE_DECODER.h = 4
_C.MODEL.HYBRID_STATE_DECODER.dropout = 0.1
_C.MODEL.HYBRID_STATE_DECODER.in_features = 512
_C.MODEL.HYBRID_STATE_DECODER.fc_output = 512
_C.MODEL.HYBRID_STATE_DECODER.RNN_output_size = 512
_C.MODEL.HYBRID_STATE_DECODER.hidden_size = 512
_C.MODEL.HYBRID_STATE_DECODER.rnn_type = "LSTM"
_C.MODEL.HYBRID_STATE_DECODER.prev_action_embedding_dim = 32
_C.MODEL.SEM_MAP_TRANSFORMER = ConfigTree()
_C.MODEL.SEM_MAP_TRANSFORMER.N = 1
_C.MODEL.SEM_MAP_TRANSFORMER.d_in = 512
_C.MODEL.SEM_MAP_TRANSFORMER.d_model = 512
_C.MODEL.SEM_MAP_TRANSFORMER.d_out = 512
_C.MODEL.SEM_MAP_TRANSFORMER.d_ff = 1024
_C.MODEL.SEM_MAP_TRANSFORMER.h = 4
_C.MODEL.SEM_MAP_TRANSFORMER.dropout = 0.1
_C.MODEL.SEM_MAP_TRANSFORMER.downsample_size = 4
_C.MODEL.SEM_MAP_TRANSFORMER.embedding_dim = 64
_C.MODEL.SEM_MAP_TRANSFORMER.layer_norm_eps = 1e-12
_C.MODEL.SEM_MAP_TRANSFORMER.n_output = 512

_C.MODEL.RGB_ENCODER = ConfigTree()
_C.MODEL.RGB_ENCODER.cnn_type = "TorchVisionResNet50"
_C.MODEL.RGB_ENCODER.output_size = 256
_C.MODEL.RGB_ENCODER.resnet_output_size = 256
_C.MODEL.RGB_ENCODER.blocks = [3, 4, 6, 3]  # ResNet50 stage depths
_C.MODEL.RGB_ENCODER.pretrained_weights = "data/weights/resnet50_imagenet.npz"

_C.MODEL.DEPTH_ENCODER = ConfigTree()
_C.MODEL.DEPTH_ENCODER.cnn_type = "VlnResnetDepthEncoder"
_C.MODEL.DEPTH_ENCODER.output_size = 128
_C.MODEL.DEPTH_ENCODER.backbone = "resnet50"
_C.MODEL.DEPTH_ENCODER.blocks = [3, 4, 6, 3]
_C.MODEL.DEPTH_ENCODER.ddppo_checkpoint = "data/ddppo-models/gibson-2plus-resnet50.pth"

_C.MODEL.STATE_ENCODER = ConfigTree()
_C.MODEL.STATE_ENCODER.hidden_size = 512
_C.MODEL.STATE_ENCODER.rnn_type = "LSTM"

_C.MODEL.SEQ2SEQ = ConfigTree()
_C.MODEL.SEQ2SEQ.use_prev_action = False

_C.MODEL.CMA = ConfigTree()
_C.MODEL.CMA.use = False
_C.MODEL.CMA.rcm_state_encoder = False
_C.MODEL.CMA.use_prev_action = False

_C.MODEL.PROGRESS_MONITOR = ConfigTree()
_C.MODEL.PROGRESS_MONITOR.use = False
_C.MODEL.PROGRESS_MONITOR.alpha = 1.0

_C.MODEL.BERT = ConfigTree()
_C.MODEL.BERT.vocab_size = 30522
_C.MODEL.BERT.hidden_size = 768
_C.MODEL.BERT.num_layers = 12
_C.MODEL.BERT.num_heads = 12
_C.MODEL.BERT.intermediate_size = 3072
_C.MODEL.BERT.max_position_embeddings = 512
_C.MODEL.BERT.type_vocab_size = 2
_C.MODEL.BERT.pretrained_weights = "data/weights/bert_base_uncased.npz"
# Documented deviation (docs/PARITY.md): the reference always freezes BERT
# (seq2seq_highlevel_cma.py:192-196 no_grad; language_encoder.py:42).  With
# trainable=True the instruction embedding trains end-to-end — required for
# language grounding when no pretrained BERT weights exist (the convergence
# study's CS_TRAIN_BERT arm).  Incompatible with PRELOAD_TRUNK_FEATURES
# (the feature store caches BERT outputs as constants).
_C.MODEL.BERT.trainable = False

_C.MODEL.TRANSFORMER = ConfigTree()
_C.MODEL.TRANSFORMER.use = False
_C.MODEL.TRANSFORMER.output_size = 512
_C.MODEL.TRANSFORMER.use_prev_action = True
_C.MODEL.TRANSFORMER.lr = 1e-4
_C.MODEL.TRANSFORMER.weight_decay = 1e-3
_C.MODEL.TRANSFORMER.lr_drop = 4
_C.MODEL.TRANSFORMER.scheduler_patience = 1e-4  # inert in the reference too
_C.MODEL.TRANSFORMER.split_gpus = False
_C.MODEL.TRANSFORMER.hidden_size = 512


def get_config(
    config_paths: Optional[Union[List[str], str]] = None,
    opts: Optional[list] = None,
) -> ConfigTree:
    """defaults <- yaml(s) <- opts; TASK_CONFIG is built from
    BASE_TASK_CONFIG_PATH exactly like reference get_config
    (config/default.py:263-290)."""
    config = _C.clone()
    if config_paths:
        if isinstance(config_paths, str):
            config_paths = [config_paths]
        for p in config_paths:
            config.merge_from_file(p)
    task_paths = config.BASE_TASK_CONFIG_PATH or None
    config.TASK_CONFIG = get_task_config(task_paths).clone().defrost()
    if opts:
        config.CMD_TRAILING_OPTS = list(opts)
        config.merge_from_list(opts)
    config.freeze()
    return config
