# Model zoo. Import submodules directly (e.g. ddsp_svc_tpu.models.ddsp);
# build_model/load_model live in .registry (imported lazily to keep import
# costs low for kernel-only users).
