# build_model lives in kinet_tpu.models.build (imported lazily to keep
# `import kinet_tpu` light); submodules: backbone, transformer,
# position_encoding, detr, deformable_detr, criterion, matcher, postprocess.
