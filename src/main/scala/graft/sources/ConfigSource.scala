package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** S10 — typed configuration source.
  *
  * Same resolution order and names as the reference (main.py:28-62): an INI
  * `config` file wins if present, else `STOXYGEN_*` environment variables,
  * else defaults (config.default:1-20). Stringly-typed INI becomes a typed
  * case class at the edge, so the engine core never parses config. */
final case class EngineConfig(
    url: String,
    urlUsername: String,
    urlPassword: String,
    rabbitmqHost: String,
    rabbitmqUsername: String,
    rabbitmqPassword: String,
    rabbitmqQueue: String,
    logLevel: String,
    storageLogs: String,
    logsFilename: String,
    logsMaxSize: Long,
    logsRotatedFiles: Int,
    heartbeatAppname: String)

object ConfigSource {
  val defaults: EngineConfig = EngineConfig(
    url = "http://localhost/api/v1",
    urlUsername = "sql-user",
    urlPassword = "123456",
    rabbitmqHost = "localhost",
    rabbitmqUsername = "guest",
    rabbitmqPassword = "guest",
    rabbitmqQueue = "test",
    logLevel = "INFO",
    storageLogs = "/opt/stockanalyses-logs/",
    logsFilename = "Importer.log",
    logsMaxSize = 11000000L,
    logsRotatedFiles = 5,
    heartbeatAppname = "downloader")

  /** Minimal INI parser: [section] headers + key=value lines, '#' comments. */
  private[sources] def parseIni(text: String): Map[String, String] = {
    var section = ""
    text.linesIterator.flatMap { raw =>
      val line = raw.trim
      if (line.isEmpty || line.startsWith("#") || line.startsWith(";")) None
      else if (line.startsWith("[") && line.endsWith("]")) {
        section = line.substring(1, line.length - 1).trim.toLowerCase
        None
      } else line.indexOf('=') match {
        case -1 => None
        case i => Some(
          s"$section.${line.take(i).trim.toLowerCase}" -> line.drop(i + 1).trim)
      }
    }.toMap
  }

  def fromIni(path: Path): EngineConfig = {
    val ini = parseIni(Files.readString(path))
    def get(k: String, dflt: String) = ini.getOrElse(k, dflt)
    EngineConfig(
      url = get("prod.url", defaults.url),
      urlUsername = get("prod.username", defaults.urlUsername),
      urlPassword = get("prod.password", defaults.urlPassword),
      rabbitmqHost = get("prod.rabbitmq_host", defaults.rabbitmqHost),
      rabbitmqUsername = get("prod.rabbitmq_username", defaults.rabbitmqUsername),
      rabbitmqPassword = get("prod.rabbitmq_password", defaults.rabbitmqPassword),
      rabbitmqQueue = get("prod.rabbitmq_queue", defaults.rabbitmqQueue),
      logLevel = get("prod.log_level", defaults.logLevel),
      storageLogs = get("path.storage_logs", defaults.storageLogs),
      logsFilename = get("path.logs_filename", defaults.logsFilename),
      logsMaxSize = get("path.logs_max_size", defaults.logsMaxSize.toString).toLong,
      logsRotatedFiles =
        get("path.logs_rotated_files", defaults.logsRotatedFiles.toString).toInt,
      heartbeatAppname = get("heartbeat.app_name", defaults.heartbeatAppname))
  }

  def fromEnv(env: Map[String, String] = sys.env): EngineConfig = {
    def get(k: String, dflt: String) = env.getOrElse(k, dflt)
    EngineConfig(
      url = get("STOXYGEN_URL", defaults.url),
      urlUsername = get("STOXYGEN_URL_USERNAME", defaults.urlUsername),
      urlPassword = get("STOXYGEN_URL_PASSWORD", defaults.urlPassword),
      rabbitmqHost = get("STOXYGEN_RABBITMQ_HOST", defaults.rabbitmqHost),
      rabbitmqUsername =
        get("STOXYGEN_RABBITMQ_USERNAME", defaults.rabbitmqUsername),
      rabbitmqPassword =
        get("STOXYGEN_RABBITMQ_PASSWORD", defaults.rabbitmqPassword),
      rabbitmqQueue = get("STOXYGEN_RABBITMQ_QUEUE", defaults.rabbitmqQueue),
      logLevel = get("STOXYGEN_LOG_LEVEL", defaults.logLevel),
      storageLogs = get("STOXYGEN_STORAGE_LOGS", defaults.storageLogs),
      logsFilename = get("STOXYGEN_LOGS_FILENAME", defaults.logsFilename),
      logsMaxSize =
        get("STOXYGEN_LOGS_MAX_SIZE", defaults.logsMaxSize.toString).toLong,
      logsRotatedFiles =
        get("STOXYGEN_LOGS_ROTATED_FILES", defaults.logsRotatedFiles.toString).toInt,
      heartbeatAppname =
        get("STOXYGEN_HEARTBEAT_APPNAME", defaults.heartbeatAppname))
  }

  /** Reference resolution order: `<dir>/config` file if present, else env. */
  def load(dir: String, env: Map[String, String] = sys.env): EngineConfig = {
    val p = Paths.get(dir, "config")
    if (Files.isRegularFile(p)) fromIni(p) else fromEnv(env)
  }
}
