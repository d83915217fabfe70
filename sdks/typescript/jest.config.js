/** Jest config: run the TS suite via ts-jest (node 18+, global fetch). */
module.exports = {
  preset: "ts-jest",
  testEnvironment: "node",
  testMatch: ["**/__tests__/**/*.test.ts"],
};
