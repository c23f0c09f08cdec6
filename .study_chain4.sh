#!/bin/bash
# Round-4 study chain, take 4: the remaining grounding arms.  Runs after the
# take-3 chain (phases 0-3) finishes; every stage is restartable, ONE TPU
# client at a time.  Progress in /root/repo/.study_chain.take4.log.
#
#   A. ground_seq2seq_r4 — meso-scale seq2seq twin of ground_cma_r4
#      (trainable-everything SimpleCNNs, 256 eps @64px)
#   B. ground_hcm_r4 — HCM with a TRAINABLE small BERT (CS_TRAIN_BERT=1,
#      2 layers, h=128; MODEL.BERT.trainable PARITY.md deviation): the r4
#      full-scale study proved HCM atop a frozen RANDOM BERT ignores
#      language (shuffled rows ~= true rows); this arm asks whether the
#      architecture grounds when the instruction pathway can train.
#      128px so the TVResNet 4x4 adaptive pool stays an identity.
#   C. dagger_seq2seq_r4 — true-DAgger arm (CS_DAGGER_P=0.75, 3 iterations,
#      envs/dagger.py) vs its BC twin (phase A) at the same epoch budget.
cd /root/repo

# wait for the take-3 chain (bash .study_chain.sh, PID recorded at launch)
TAKE3_PID="${TAKE3_PID:-5652}"
while kill -0 "$TAKE3_PID" 2>/dev/null; do
  sleep 60
done
echo "take-3 chain done; starting take-4 phases"

probe_tunnel() {
  for i in $(seq 1 60); do
    if timeout 90 python -c "
import jax, jax.numpy as jnp
print(float(jnp.ones((8,)).sum()))" >/dev/null 2>&1; then
      echo "tunnel healthy after $i probes"
      return 0
    fi
    echo "probe $i: tunnel not ready"
    sleep 90
  done
  echo "tunnel never recovered"
  return 1
}

probe_tunnel || exit 1

echo "=== phase A: meso grounding study (seq2seq-simple, 256 eps @64px) ==="
CS_MODEL=seq2seq CS_SIMPLE=1 CS_RGB=64 CS_DEPTH=64 CS_TRAIN=256 CS_VAL=24 \
  CS_EPOCHS=24 CS_EVAL_EVERY=4 CS_BATCH=8 CS_EPOCHS_PER_PROC=8 \
  CS_INSTR_LEN=48 CS_HOST_EPISODES=4 \
  python scripts/convergence_study.py /root/repo/.study_out/ground_seq2seq_r4
echo "GROUND SEQ2SEQ EXIT: $?"

probe_tunnel || exit 1

echo "=== phase B: hcm grounding study (trainable BERT-2/128, 256 eps @128px) ==="
CS_MODEL=hcm CS_TRAIN_BERT=1 CS_BERT_HIDDEN=128 CS_BERT_LAYERS=2 \
  CS_FEATURE_MODE=0 CS_RGB=128 CS_DEPTH=128 CS_TRAIN=256 CS_VAL=24 \
  CS_EPOCHS=24 CS_EVAL_EVERY=4 CS_BATCH=8 CS_EPOCHS_PER_PROC=4 \
  CS_INSTR_LEN=48 CS_HOST_EPISODES=4 \
  python scripts/convergence_study.py /root/repo/.study_out/ground_hcm_r4
echo "GROUND HCM EXIT: $?"

probe_tunnel || exit 1

echo "=== phase C: true-DAgger arm (seq2seq-simple, P=0.75 x3 iterations) ==="
CS_MODEL=seq2seq CS_SIMPLE=1 CS_RGB=64 CS_DEPTH=64 CS_TRAIN=256 CS_VAL=24 \
  CS_EPOCHS=24 CS_EVAL_EVERY=4 CS_BATCH=8 CS_EPOCHS_PER_PROC=8 \
  CS_INSTR_LEN=48 CS_HOST_EPISODES=4 CS_DAGGER_P=0.75 CS_DAGGER_ITERS=3 \
  python scripts/convergence_study.py /root/repo/.study_out/dagger_seq2seq_r4
echo "DAGGER SEQ2SEQ EXIT: $?"
echo "CHAIN4 DONE"
