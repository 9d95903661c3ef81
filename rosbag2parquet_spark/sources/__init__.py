"""Sources: fixture catalog, message-definition schema compiler, bag-style
log source emulation (reference S1/S4 — rosbag2parquet.cpp:41-63,
MessageTable.cpp:305-361)."""
