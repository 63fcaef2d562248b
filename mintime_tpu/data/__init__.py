from mintime_tpu.data.assembler import (  # noqa: F401
    IdentityFaces,
    SequencePlan,
    assign_slots,
    build_identities_mask,
    build_positions,
    build_sequence_plan,
    size_bucket,
    sort_identities,
    subsample_indices,
)
