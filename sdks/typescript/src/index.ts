export { Cortex, CortexError } from "./client";
export type { NodeData, SearchHit, TraversalResult, StoreOptions, CortexOptions } from "./client";
export { MockCortex } from "./testing";
