# Shared default query list for the 100x-shape cliff probe (r19 ADVICE:
# gate.sh used to recover this list by grepping sf10_probe.sh's SOURCE
# TEXT for a literal 'QUERIES=${...}' line — any reformatting silently
# emptied it). Both tools/sf10_probe.sh and tools/gate.sh --probe100
# source THIS file; there is exactly one copy of the list.
#
# Contents: the ~10 costliest sf0.1 queries (the standing probe set).
# gate.sh --probe100 EXTENDS it automatically with every query
# registered since the previous round-close commit (VERDICT r19 #4), so
# new operators ride the probe without anyone remembering PROBE_EXTRA.
PROBE_BASE_QUERIES="q_source_family,q_pipeline,q_decontam_bloom,q_cell_labels,q_hard_negatives,q_source_overlap,q_containment,q_decontam_semantic,q_winnow,q_media_dedup"
