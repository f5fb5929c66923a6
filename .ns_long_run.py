import time
from enf_pde_tpu.config import load_experiment_config
from enf_pde_tpu.experiments.fit import run_experiment
cfg = load_experiment_config("navier_stokes", [
    "dataset.num_signals_train=128", "dataset.num_signals_test=32",
    "dataset.batch_size=8",
    "training.num_epochs=500",
    "training.nef.train_until_epoch=300",
    "training.ode.train_from_epoch=300",
    "test.test_interval=100", "test.test_dp_interval=500",
    "test.test_equiv_at_epoch=250",
    "logging.checkpoint=false", "logging.log_dir=/tmp/ns_long",
    "logging.log_every_n_steps=1600",
    "dataset.path=/root/repo/data/",
])
t0 = time.time()
run_experiment(cfg)
print("NS long run done in", round(time.time()-t0,1), "s")
